"""Worker for the 2-process DCN smoke test (run as a subprocess, one per
"host"). Joins a jax.distributed CPU cluster via initialize_multihost, then
runs one sharded CA-CG solve over the GLOBAL (cross-process) device mesh and
verifies the residual against a local NumPy oracle.

This is the execution evidence SURVEY.md §5 prescribes for the multi-host
(DCN) path — the reference has no distributed backend at all (every PETSc
object lives on PETSC_COMM_SELF, /root/reference/lib/Runtime/PETSc/
NeptunePETScRuntime.cpp:136).

Usage: python dcn_worker.py <process_id> <num_processes> <port>
Prints "DCN_OK iters=<n> rel=<r>" on success.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import neptune_tpu as ntp  # noqa: E402
from neptune_tpu.parallel import GridMesh, cg_sharded, initialize_multihost  # noqa: E402

ndev = initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert ndev == 2 * nproc, ndev  # 2 local devices per process, global view

n = 64
ntp.reset_context()


@ntp.linear_op_def(
    bounds=([0, 0], [n, n]),
    interior=([1, 1], [n - 1, n - 1]),
    dtype="float64",
    name="lap_dcn",
)
def lap_dcn(u):
    return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]


cm = ntp.get_context().compiled()
gm = GridMesh((ndev,), ("x",))

rng = np.random.default_rng(7)
b_np = np.zeros((n, n))
b_np[1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2))

b = jax.make_array_from_callback(
    (n, n), gm.sharding(2), lambda idx: b_np[idx]
)

solve = jax.jit(cg_sharded(cm, "lap_dcn", gm, s=4, maxiter=800, tol=1e-10))
x, info = solve(b)

from jax.experimental import multihost_utils  # noqa: E402

x_np = np.asarray(multihost_utils.process_allgather(x, tiled=True))

# oracle: interior 5-pt apply, copy-through (identity) on the boundary ring
ax = x_np.copy()
c = x_np[1:-1, 1:-1]
ax[1:-1, 1:-1] = (
    4.0 * c - x_np[:-2, 1:-1] - x_np[2:, 1:-1] - x_np[1:-1, :-2] - x_np[1:-1, 2:]
)
rel = float(np.linalg.norm(b_np - ax) / np.linalg.norm(b_np))
assert rel < 1e-8, rel
assert bool(info.converged)
print(f"DCN_OK iters={int(info.iters)} rel={rel:.3e}", flush=True)
