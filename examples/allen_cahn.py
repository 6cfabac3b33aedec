"""Allen–Cahn equation, three time integrators — the reference's
`smoke_time_advance.mlir` (IMEX: explicit reaction + implicit-linear
diffusion) and `smoke_time_advance_nonlinear.mlir` (fully-implicit Newton)
golden paths as a runnable demo, plus an explicit RK4 variant.

Run: python examples/allen_cahn.py
"""

import numpy as np

import neptune_tpu as ntp

N = 128
DT = 1e-2
EPS2 = 1e-2
DXINV2 = (N / 1.0) ** 2 / 100.0  # scaled for stability of the demo


@ntp.linear_op_def(bounds=([0], [N]), interior=([1], [N - 1]), name="ac_lap")
def ac_lap(u):
    return DXINV2 * (u[-1] - 2.0 * u[0] + u[1])


@ntp.linear_op_def(bounds=([0], [N]), interior=([1], [N - 1]), name="ac_A")
def ac_A(x):
    # A(x) = x - dt*eps2 * Lap(x)
    lap = DXINV2 * (x[-1] - 2.0 * x[0] + x[1])
    return x[0] - (DT * EPS2) * lap


@ntp.nonlinear_op_def(bounds=([0], [N]), name="ac_rhs")
def ac_rhs(u):
    lap = DXINV2 * (u[-1] - 2.0 * u[0] + u[1])
    react = u[0] - u[0] * u[0] * u[0]
    i = ntp.index(0)
    interior = EPS2 * lap + react
    return ntp.where((i == 0) | (i == N - 1), 0.0 * u[0], interior)


def imex_step(u):
    """u* = u + dt*(u - u^3); then (I - dt eps2 Lap) u1 = u* — the
    smoke_time_advance.mlir path (GMRES tol 1e-8)."""
    ustar = ntp.apply(inputs=[u], bounds=([1], [N - 1]))(
        lambda t: t[0] + DT * (t[0] - t[0] * t[0] * t[0])
    )
    return ntp.solve_linear(
        ntp.assemble_matrix(ac_A), ustar.node.concrete, solver="gmres",
        tol=1e-8, max_iters=200,
    )


def newton_step(u_prev_arr):
    """Fully-implicit Euler residual solved by Newton–Krylov — the
    smoke_time_advance_nonlinear.mlir path (tol 1e-10, max 20)."""
    u_prev = ntp.temp(u_prev_arr)

    def residual(u):
        i = ntp.index(0)
        boundary = (i == 0) | (i == N - 1)
        lap = DXINV2 * (u[-1] - 2.0 * u[0] + u[1])
        react = u[0] - u[0] * u[0] * u[0]
        rhs = EPS2 * lap + react
        interior = u[0] - u_prev[0] - DT * rhs
        return ntp.where(boundary, u[0] - u_prev[0], interior)

    return ntp.solve_nonlinear(residual, u_prev_arr, tol=1e-10, max_iters=20)


def main():
    x = np.linspace(-1, 1, N)
    u0 = (0.9 * np.sign(np.sin(4 * np.pi * x)) + 0.05 * np.cos(2 * np.pi * x)).astype(
        float
    )

    u = u0.copy()
    for _ in range(20):
        u = np.asarray(imex_step(u))
    print(f"IMEX (implicit-linear, GMRES):  energy={np.sum(u**2):.6f}")

    u = u0.copy()
    for _ in range(20):
        u = np.asarray(newton_step(u))
    print(f"Fully implicit (Newton/JFNK):   energy={np.sum(u**2):.6f}")

    u = u0.copy()
    for _ in range(20):
        u = np.asarray(ntp.time_advance(u, DT, "explicit", rhs=ac_rhs, scheme="rk4"))
    print(f"Explicit RK4:                   energy={np.sum(u**2):.6f}")


if __name__ == "__main__":
    main()
