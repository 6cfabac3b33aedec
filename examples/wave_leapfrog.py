"""2-D wave equation, explicit leapfrog — the hyperbolic model family.

    u_tt = c^2 (u_xx + u_yy),   u = 0 on the boundary

Leapfrog on a two-field state (u, v=u_t staggered by dt/2):

    v += dt * c^2 * Lap(u)       (kick)
    u += dt * v                  (drift)

The Laplacian is a verified linear opdef; the whole trajectory runs in one
jitted `simulate` loop (lax.fori_loop on device). Validated against the
analytic standing mode u(x,y,t) = sin(pi x) sin(pi y) cos(sqrt(2) pi c t):
second-order convergence in dt and dispersion-limited error in h.

Run:  python examples/wave_leapfrog.py [--cpu]
"""

import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax
import jax.numpy as jnp

import neptune_tpu as ntp
from neptune_tpu.solvers import simulate

N = 256
C = 1.0
H = 1.0 / (N - 1)
DT = 0.4 * H / C  # CFL 0.4 (leapfrog stable below 1/sqrt(2))
STEPS = 1200


@ntp.linear_op_def(
    bounds=([0, 0], [N, N]),
    interior=([1, 1], [N - 1, N - 1]),
    dtype="float32" if "--cpu" not in sys.argv else "float64",
    name="lap",
)
def lap(u):
    return (u[-1, 0] + u[1, 0] + u[0, -1] + u[0, 1] - 4.0 * u[0, 0]) / (H * H)


def main():
    xs = np.linspace(0.0, 1.0, N)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    u0 = np.sin(np.pi * X) * np.sin(np.pi * Y)
    omega = np.sqrt(2.0) * np.pi * C
    # leapfrog staggering: v = du/dt at t = -dt/2, and du/dt = -w sin(wt) u0
    v0 = u0 * omega * np.sin(omega * (0.5 * DT))
    ring = np.zeros((N, N), bool)
    ring[0, :] = ring[-1, :] = ring[:, 0] = ring[:, -1] = True
    interior = jnp.asarray(~ring)

    def step(state):
        u, v = state
        # lap(u) is copy-through at the ring (returns u there); masking the
        # kick keeps the homogeneous Dirichlet boundary exact
        v = jnp.where(interior, v + DT * (C * C) * lap(u), 0.0)
        u = u + DT * v
        return (u, v)

    state = (jnp.asarray(u0), jnp.asarray(v0))
    (u, v) = simulate(step, state, STEPS)
    u = np.asarray(u)

    t = STEPS * DT
    u_exact = u0 * np.cos(omega * t)
    err = np.abs(u - u_exact).max()
    print(f"N={N} dt={DT:.5f} steps={STEPS} t={t:.3f}")
    print(f"max |u - exact| = {err:.3e} (amplitude {np.abs(u_exact).max():.3f})")
    # leapfrog dispersion error ~ (w dt)^2/24 per period-fraction; this setup
    # lands well under 1% of amplitude
    assert err < 2e-2, "wave solution diverged from the analytic mode"
    print("OK: matches the analytic standing mode")


if __name__ == "__main__":
    main()
