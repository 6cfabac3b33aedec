"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: 2-D 5-point Jacobi sweep on a 1024² float32 grid (BASELINE.json
config #1), measured in cell-updates/sec/chip. vs_baseline is the ratio
against the BASELINE.md target of 80% of the per-chip HBM-bandwidth roofline
(v5e: 819 GB/s / 8 B-per-cell = 102.4 Gcell/s; target 81.9 Gcell/s). The
reference publishes no numbers of its own (BASELINE.md).

Timing method: K sweeps inside one jitted fori_loop, completion forced by a
checksum fetch, device time taken as the slope between two K values (the axon
tunnel's block_until_ready does not synchronize, and a single call is
RTT-dominated).

Richer results for all BASELINE.json configs are written to
benchmarks/results.json when --all is passed.
"""

import json
import sys
import time

import numpy as np


HBM_BYTES_PER_SEC = 819e9  # TPU v5e spec
ROOFLINE_CELLS = HBM_BYTES_PER_SEC / 8.0  # 1 f32 read + 1 f32 write per cell
TARGET_CELLS = 0.8 * ROOFLINE_CELLS


def timed_sweep(step_fn, x, K1, K2):
    import jax
    import jax.numpy as jnp

    def run_K(K):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, K, lambda i, v: step_fn(v), x)

        y = run(x)
        _ = float(jnp.sum(y))  # compile + warm + sync
        t0 = time.perf_counter()
        y = run(x)
        _ = float(jnp.sum(y))
        return time.perf_counter() - t0

    # min-of-2 per K: the tunnel RTT (~25 ms) is noisy and additive, the
    # min is the cleanest estimate of deterministic device time
    t1 = min(run_K(K1), run_K(K1))
    t2 = min(run_K(K2), run_K(K2))
    return (t2 - t1) / (K2 - K1)


def make_jacobi_2d(n, dtype="float32"):
    import neptune_tpu as ntp

    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]), dtype=dtype
    )
    def jacobi(u):
        return 0.25 * (u[-1, 0] + u[1, 0] + u[0, -1] + u[0, 1])

    return jacobi


def make_heat_3d(m, dtype="float32"):
    import neptune_tpu as ntp

    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0, 0, 0], [m, m, m]),
        interior=([1, 1, 1], [m - 1, m - 1, m - 1]),
        dtype=dtype,
    )
    def heat(u):
        return u[0, 0, 0] + 0.1 * (
            u[-1, 0, 0] + u[1, 0, 0] + u[0, -1, 0]
            + u[0, 1, 0] + u[0, 0, -1] + u[0, 0, 1]
            - 6.0 * u[0, 0, 0]
        )

    return heat


def make_advection_2d(n, dtype="float32"):
    """4th-order advection: wide multi-offset stencil (BASELINE config #3)."""
    import neptune_tpu as ntp

    ntp.reset_context()

    @ntp.nonlinear_op_def(
        bounds=([0, 0], [n, n]), interior=([2, 2], [n - 2, n - 2]), dtype=dtype
    )
    def adv4(u):
        dudx = (-u[2, 0] + 8.0 * u[1, 0] - 8.0 * u[-1, 0] + u[-2, 0]) / 12.0
        dudy = (-u[0, 2] + 8.0 * u[0, 1] - 8.0 * u[0, -1] + u[0, -2]) / 12.0
        return u[0, 0] - 0.1 * (0.7 * dudx + 0.3 * dudy)

    return adv4


def headline():
    import jax
    import jax.numpy as jnp

    n = 1024
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    )
    fn = make_jacobi_2d(n)
    dt = timed_sweep(fn, x, 1000, 5000)
    cells = n * n / dt
    return {
        "metric": "2D 5-pt Jacobi cell-updates/sec/chip (1024^2 f32)",
        "value": round(cells / 1e9, 2),
        "unit": "Gcell/s",
        "vs_baseline": round(cells / TARGET_CELLS, 3),
    }


def full_suite():
    import jax
    import jax.numpy as jnp

    from neptune_tpu.solvers import cg
    import neptune_tpu as ntp

    results = {}
    rng = np.random.default_rng(0)

    # config 1: 2D 5-pt Jacobi 1024^2
    n = 1024
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    dt = timed_sweep(make_jacobi_2d(n), x, 500, 2500)
    results["jacobi_2d_1024"] = {
        "us_per_sweep": dt * 1e6,
        "gcell_per_s": n * n / dt / 1e9,
        "frac_of_hbm_roofline": (n * n / dt) / ROOFLINE_CELLS,
    }

    # config 2: 3D 7-pt heat 256^3
    m = 256
    x3 = jnp.asarray(rng.standard_normal((m, m, m)).astype(np.float32))
    dt = timed_sweep(make_heat_3d(m), x3, 20, 100)
    results["heat_3d_256"] = {
        "us_per_sweep": dt * 1e6,
        "gcell_per_s": m**3 / dt / 1e9,
        "frac_of_hbm_roofline": (m**3 / dt) / ROOFLINE_CELLS,
    }

    # config 3: 4th-order advection (wide stencil)
    n = 1024
    dt = timed_sweep(make_advection_2d(n), x, 300, 1500)
    results["advection4_2d_1024"] = {
        "us_per_sweep": dt * 1e6,
        "gcell_per_s": n * n / dt / 1e9,
    }

    # config 1b: temporal-blocking fused sweeps at an HBM-resident size —
    # K sweeps per HBM pass beats the single-sweep bandwidth roofline
    n4, K = 4096, 16
    make_jacobi_2d(n4)
    x4 = jnp.asarray(rng.standard_normal((n4, n4)).astype(np.float32))
    fused16 = ntp.get_context().compiled().sweeps("jacobi", K)
    dt = timed_sweep(fused16, x4, 4, 12)  # dt per 16-sweep fused call
    results["jacobi_2d_4096_temporal_k16"] = {
        "us_per_sweep": dt / K * 1e6,
        "gcell_per_s": n4 * n4 * K / dt / 1e9,
        "frac_of_single_sweep_roofline": (n4 * n4 * K / dt) / ROOFLINE_CELLS,
        "kernel": "temporal-blocking multisweep (K sweeps per HBM pass)",
    }

    # config 1c: VMEM-resident temporal blocking at a VMEM-scale size
    make_jacobi_2d(1024)
    fused_r = ntp.get_context().compiled().sweeps("jacobi", 16)
    dt = timed_sweep(fused_r, x, 40, 120)
    results["jacobi_2d_1024_temporal_k16"] = {
        "us_per_sweep": dt / 16 * 1e6,
        "gcell_per_s": 1024 * 1024 * 16 / dt / 1e9,
        "frac_of_single_sweep_roofline": (1024 * 1024 * 16 / dt) / ROOFLINE_CELLS,
        "kernel": "temporal-blocking multisweep (whole grid VMEM-resident)",
    }

    # config 4: matrix-free CG Poisson + Jacobi preconditioner
    n = 512
    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]), dtype="float32"
    )
    def poisson(u):
        return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

    H = ntp.assemble_matrix(poisson)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    import jax as _jax
    from neptune_tpu.solvers.fused import fused_cg

    from neptune_tpu.solvers.precond import safe_inv_diag

    cm = ntp.get_context().compiled()
    inv_diag = safe_inv_diag(H.diagonal())
    solve_f = fused_cg(cm.module, "poisson", tol=1e-5, maxiter=2000,
                       inv_diag=inv_diag)

    REP = 10

    @_jax.jit
    def many(b):
        def body(i, carry):
            b, tot = carry
            x, it, rn = solve_f(b)
            return b + 1e-6 * x, tot + it

        return _jax.lax.fori_loop(0, REP, body, (b, jnp.int32(0)))

    y, tot = many(b)
    _ = float(jnp.sum(y))
    t0 = time.perf_counter()
    y, tot = many(b)
    _ = float(jnp.sum(y))
    total = (time.perf_counter() - t0) / REP
    iters = int(tot) // REP
    results["cg_poisson_512"] = {
        "iters": iters,
        "sec_per_solve": total,
        "iters_per_sec": iters / total,
        "kernel": "fused VMEM-resident CG + Jacobi",
    }

    # config 5: multi-chip 3D stencil — requires a multi-chip slice; recorded
    # as single-chip shard_map here (the driver's dryrun covers compilation)
    results["note_multichip"] = (
        "single chip available; multi-chip path validated via "
        "__graft_entry__.dryrun_multichip on a virtual mesh"
    )
    return results


if __name__ == "__main__":
    out = headline()
    if "--all" in sys.argv:
        import pathlib

        res = full_suite()
        p = pathlib.Path(__file__).parent / "benchmarks" / "results.json"
        p.parent.mkdir(exist_ok=True)
        p.write_text(json.dumps(res, indent=2))
        print(json.dumps(res, indent=2), file=sys.stderr)
    print(json.dumps(out))
