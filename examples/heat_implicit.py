"""Implicit heat equation via @jit_class — the reference's `test_jit.py`
HeatSolver demo (`test/python_tests/test_jit.py`), but actually running on
data (the reference version only dumps IR).

Run: python examples/heat_implicit.py
"""

import numpy as np

import neptune_tpu as ntp

N = 256
DT = 0.1


# Physics: A(u) = u - dt * lap(u)  (backward Euler system operator)
@ntp.linear_op_def(bounds=([0], [N]), interior=([1], [N - 1]))
def heat_system(u):
    lap = u[-1] - 2.0 * u[0] + u[1]
    return u[0] - DT * lap


@ntp.jit_class
class HeatSolver:
    def __init__(self, dt):
        self.dt = dt
        self.H = ntp.assemble_matrix(heat_system)

    def step(self, u):
        return ntp.solve_linear(self.H, u, solver="cg", tol=1e-10, max_iters=2000)


def main():
    solver = HeatSolver(dt=DT)
    x = np.linspace(-3, 3, N)
    u = np.exp(-(x**2)).astype(np.float64)

    print(f"initial: max={u.max():.6f} sum={u.sum():.6f}")
    for n in range(10):
        u = np.asarray(solver.step(u))
    print(f"after 10 implicit steps: max={u.max():.6f} sum={u.sum():.6f}")

    print("\n[traced IR]")
    print(ntp.get_compiler().dump()[:800])


if __name__ == "__main__":
    main()
