"""Black–Scholes implicit pricing step — the reference's
`smoke_time_advance_bs.mlir` golden path (A(v) = v - dt(a v_xx + b v_x + c v),
GMRES tol 1e-10, max 500) as a runnable demo with a full backward induction.

Run: python examples/black_scholes.py
"""

import numpy as np

import neptune_tpu as ntp

N = 128
SIGMA, R = 0.2, 0.05
S_MAX, K = 300.0, 100.0
T, STEPS = 1.0, 100
DT = T / STEPS
DS = S_MAX / (N - 1)


@ntp.nonlinear_op_def(bounds=([0], [N]), interior=([1], [N - 1]), name="bs_A")
def bs_A(v):
    # nonlinear_op_def because coefficients depend on the grid index
    # (a(S) = sigma^2 S^2 / 2) — allowed there, whitelisted out of linear_op_def
    i = ntp.index(0)
    # cast index to the value dtype via arithmetic with floats
    S = (i * 1.0) * DS
    a = 0.5 * SIGMA * SIGMA * S * S
    b = R * S
    vxx = (v[-1] - 2.0 * v[0] + v[1]) / (DS * DS)
    vx = (v[1] - v[-1]) / (2.0 * DS)
    L = a * vxx + b * vx - R * v[0]
    return v[0] - DT * L


def main():
    S = np.linspace(0, S_MAX, N)
    v = np.maximum(S - K, 0.0)  # call payoff at expiry

    def residual_factory(v_prev_arr):
        v_prev = ntp.temp(v_prev_arr)

        def residual(v):
            i = ntp.index(0)
            boundary = (i == 0) | (i == N - 1)
            Sg = (i * 1.0) * DS
            a = 0.5 * SIGMA * SIGMA * Sg * Sg
            b = R * Sg
            vxx = (v[-1] - 2.0 * v[0] + v[1]) / (DS * DS)
            vx = (v[1] - v[-1]) / (2.0 * DS)
            L = a * vxx + b * vx - R * v[0]
            interior = v[0] - DT * L - v_prev[0]
            return ntp.where(boundary, v[0] - v_prev[0], interior)

        return residual

    for n in range(STEPS):
        v = np.asarray(
            ntp.solve_nonlinear(residual_factory(v), v, tol=1e-10, max_iters=20)
        )

    # Black–Scholes closed form at t=0 for comparison
    from math import erf, exp, log, sqrt

    def bs_call(S0):
        if S0 <= 0:
            return 0.0
        d1 = (log(S0 / K) + (R + 0.5 * SIGMA**2) * T) / (SIGMA * sqrt(T))
        d2 = d1 - SIGMA * sqrt(T)
        Phi = lambda x: 0.5 * (1 + erf(x / sqrt(2)))
        return S0 * Phi(d1) - K * exp(-R * T) * Phi(d2)

    idx = np.searchsorted(S, 100.0)
    print(f"PDE price at S=100:        {v[idx]:.4f}")
    print(f"closed-form price at S=100: {bs_call(S[idx]):.4f}")
    err = abs(v[idx] - bs_call(S[idx]))
    print(f"abs error: {err:.4f} (O(dt + dS^2) discretization)")


if __name__ == "__main__":
    main()
