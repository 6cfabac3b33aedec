"""Fully-implicit 1-D shallow-water equations (dam break) via JFNK.

This is the reference's *aspirational* demo
(`test/python_tests/test_swe_implicit.py`): closure residuals over multi-field
states with `solve_nonlinear(..., initial_guess=(h, q),
method="newton-krylov")`. The reference cannot run it (no `solve_nonlinear`
export); here it works.

Run: python examples/swe_implicit.py
"""

import time

import numpy as np

import neptune_tpu as ntp

g = 9.81


@ntp.jit_class
class ImplicitSWESolver:
    def __init__(self, dt, dx, nx):
        self.dt = dt
        self.dx = dx
        self.nx = nx

    def step(self, h_curr, q_curr):
        dt, dx, nx = self.dt, self.dx, self.nx

        def swe_residual(h, q):
            # flux F(U): (q, q^2/h + g h^2/2) — pointwise temp algebra
            fh = q
            fq = (q * q) / h + 0.5 * g * (h * h)
            # central-difference flux divergence (stencil access on fluxes)
            div_fh = (fh[1] - fh[-1]) / (2.0 * dx)
            div_fq = (fq[1] - fq[-1]) / (2.0 * dx)
            dt_h = (h[0] - h_curr[0]) / dt
            dt_q = (q[0] - q_curr[0]) / dt
            i = ntp.index(0)
            boundary = (i == 0) | (i == nx - 1)
            res_h = ntp.where(boundary, h[0] - h_curr[0], dt_h + div_fh)
            res_q = ntp.where(boundary, q[0] - q_curr[0], dt_q + div_fq)
            return res_h, res_q

        return ntp.solve_nonlinear(
            swe_residual,
            initial_guess=(h_curr, q_curr),
            method="newton-krylov",
            tol=1e-10,
        )


def main():
    nx, dx, dt, steps = 100, 1.0, 0.1, 10

    h = np.ones(nx)
    h[: nx // 2] = 2.0  # dam break: high water on the left
    q = np.zeros(nx)

    print(f"SWE dam break: nx={nx} dt={dt} (implicit — large steps allowed)")
    solver = ImplicitSWESolver(dt=dt, dx=dx, nx=nx)

    t0 = time.time()
    for n in range(steps):
        h, q = solver.step(h, q)
        h, q = np.asarray(h), np.asarray(q)
        print(f"  step {n}: avg height = {h.mean():.4f}  max |q| = {np.abs(q).max():.4f}")
    print(f"finished in {time.time() - t0:.3f}s")
    print("front sample:", np.round(h[45:55], 4))


if __name__ == "__main__":
    main()
