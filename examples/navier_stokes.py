"""2-D lid-driven cavity (incompressible Navier–Stokes) — the full stack in
one model: vorticity–streamfunction formulation with an explicit
advection-diffusion stencil step plus a streamfunction-Poisson CG solve every
step, run as chunked device loops with checkpoint/resume via the
SimulationDriver.

    ω_t + u ω_x + v ω_y = ν ∇²ω         (explicit update)
    ∇²ψ = −ω,  u = ψ_y, v = −ψ_x        (CG solve + central gradients)
    wall vorticity from Thom's formula (lid drives the flow)

Run: python examples/navier_stokes.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import neptune_tpu as ntp
from neptune_tpu.solvers import cg
from neptune_tpu.utils.driver import SimulationDriver

N = 64  # grid (unit square)
DX = 1.0 / (N - 1)
RE = 100.0
NU = 1.0 / RE
DT = 0.2 * DX * DX / NU  # diffusive stability limit
LID = 1.0


# -lap with Dirichlet (identity) boundary rows: the streamfunction operator
@ntp.linear_op_def(
    bounds=([0, 0], [N, N]), interior=([1, 1], [N - 1, N - 1]), dtype="float64",
    name="psi_poisson",
)
def psi_poisson(p):
    return (4.0 * p[0, 0] - p[-1, 0] - p[1, 0] - p[0, -1] - p[0, 1]) / (DX * DX)


def make_step():
    mv = ntp.get_context().compiled().opdef("psi_poisson")

    def step(state):
        w = state["w"]

        # streamfunction: -lap psi = w  (psi = 0 on walls via identity rows)
        rhs = jnp.zeros_like(w).at[1:-1, 1:-1].set(w[1:-1, 1:-1])
        psi, _ = cg(mv, rhs, tol=1e-10, maxiter=4000)

        # velocities from psi (central differences; axis 0 = y, axis 1 = x)
        u = jnp.zeros_like(w).at[1:-1, 1:-1].set(
            (psi[2:, 1:-1] - psi[:-2, 1:-1]) / (2 * DX)
        )
        v = jnp.zeros_like(w).at[1:-1, 1:-1].set(
            -(psi[1:-1, 2:] - psi[1:-1, :-2]) / (2 * DX)
        )
        u = u.at[-1, :].set(LID)

        # wall vorticity (Thom): w_wall = -2 psi_adj / dx^2 (± lid term)
        w = w.at[0, :].set(-2.0 * psi[1, :] / (DX * DX))
        w = w.at[-1, :].set(-2.0 * psi[-2, :] / (DX * DX) - 2.0 * LID / DX)
        w = w.at[:, 0].set(-2.0 * psi[:, 1] / (DX * DX))
        w = w.at[:, -1].set(-2.0 * psi[:, -2] / (DX * DX))

        # explicit advection-diffusion of vorticity on the interior
        wx = (w[1:-1, 2:] - w[1:-1, :-2]) / (2 * DX)
        wy = (w[2:, 1:-1] - w[:-2, 1:-1]) / (2 * DX)
        lapw = (
            w[2:, 1:-1] + w[:-2, 1:-1] + w[1:-1, 2:] + w[1:-1, :-2]
            - 4 * w[1:-1, 1:-1]
        ) / (DX * DX)
        wi = w[1:-1, 1:-1] + DT * (
            -u[1:-1, 1:-1] * wx - v[1:-1, 1:-1] * wy + NU * lapw
        )
        w = w.at[1:-1, 1:-1].set(wi)
        return {"w": w}

    return step


def velocities(w):
    """Diagnostic u,v from the converged streamfunction of state w."""
    mv = ntp.get_context().compiled().opdef("psi_poisson")
    rhs = jnp.zeros_like(w).at[1:-1, 1:-1].set(w[1:-1, 1:-1])
    psi, _ = cg(mv, jnp.asarray(rhs), tol=1e-10, maxiter=4000)
    u = np.zeros_like(np.asarray(w))
    v = np.zeros_like(u)
    p = np.asarray(psi)
    u[1:-1, 1:-1] = (p[2:, 1:-1] - p[:-2, 1:-1]) / (2 * DX)
    v[1:-1, 1:-1] = -(p[1:-1, 2:] - p[1:-1, :-2]) / (2 * DX)
    u[-1, :] = LID
    return u, v, p


def main(tmp_checkpoint="/tmp/ns_cavity.npz"):
    import os

    if os.path.exists(tmp_checkpoint):
        os.remove(tmp_checkpoint)

    step = make_step()
    driver = SimulationDriver(step, tmp_checkpoint, checkpoint_every=200, dt=DT)
    init = {"w": np.zeros((N, N))}

    state, n = driver.run(init, 1000)
    u, v, psi = velocities(jnp.asarray(state["w"]))
    print(f"after {n} steps (Re={RE}, t={n*DT:.3f}):")
    print(f"  max |u| = {np.abs(u).max():.3f} (lid = {LID})")
    print(f"  center u = {u[N//2, N//2]:+.4f}  (negative: return flow)")
    print(f"  min psi = {psi.min():+.5f}  (primary vortex strength)")

    # resume demo: the driver picks up from the checkpoint
    state2, n2 = driver.run(init, 1200)
    print(f"resumed from step {n} -> advanced to {n2}")


if __name__ == "__main__":
    main()
