"""The preconditioner surface of `solve_linear` — PETSc's `-pc_type`
options DB through the DSL (`/root/reference/lib/Runtime/PETSc/
NeptunePETScRuntime.cpp:139-150` exposes it only via runtime option
strings; here it is a first-class argument).

One 256^2 Poisson system with Dirichlet boundary data, solved four ways:

  precond="none"    plain CG
  precond="jacobi"  probed-diagonal scaling (free per iteration)
  precond="ssor"    matrix-free red-black SSOR (2 extra operator
                    applications per iteration, ~3x fewer iterations)
  precond="mg"      auto-coarsened geometric V-cycle (h-independent
                    iteration counts; the hierarchy is built by 2:1
                    re-instantiation of the SAME stencil body)

The right-hand side deliberately carries nonzero BOUNDARY values: the
copy-through ring makes the system nonsymmetric there, and the solve paths
lift the boundary data out before the Krylov loop (one extra matvec) so
preconditioned CG stays in its symmetric subspace — without the lift,
Jacobi/SSOR-preconditioned CG stalls ~5 digits short of tol.

Run:  python examples/preconditioned_poisson.py [--cpu]
"""

import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import neptune_tpu as ntp

N = 256
TOL = 1e-10

ntp.reset_context()


@ntp.linear_op_def(
    bounds=([0, 0], [N, N]), interior=([1, 1], [N - 1, N - 1]), name="poisson"
)
def poisson(u):
    return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]


H = ntp.assemble_matrix(poisson)

rng = np.random.default_rng(0)
b = rng.standard_normal((N, N))  # nonzero ring values = boundary data

x_ref = None
results = {}
for pc, opts in (
    ("none", None),
    ("jacobi", None),
    ("ssor", {"omega": 1.2}),
    ("mg", {"mg_levels": 4}),
):
    t0 = time.perf_counter()
    x = ntp.solve_linear(
        H, b, solver="cg", tol=TOL, max_iters=20000, precond=pc,
        options=opts, verbose=True,
    )
    dt = time.perf_counter() - t0
    r = b - np.asarray(H.matvec(jnp.asarray(x)))
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    results[pc] = (dt, rel)
    if x_ref is None:
        x_ref = np.asarray(x)
    else:
        agree = np.abs(np.asarray(x) - x_ref).max()
        assert agree < 1e-6, f"{pc} disagrees with none by {agree:.2e}"
    print(f"precond={pc:7s} rel resnorm {rel:.2e}  wall {dt:.2f}s")
    assert rel <= TOL * 1.01, f"{pc} did not converge: {rel:.2e}"

print("all four preconditioners reached", TOL, "on the same system; OK")
