"""Affine folding (`config.fold_affine`, jnp_backend.eval_scalar_dag).

The fold collapses constant-coefficient linear combinations of stencil
accesses into one coefficient-folded FMA chain. These tests pin the
semantic contract directly (the fuzz suite covers parity broadly):
  * folded == unfolded to dtype roundoff for linear/affine bodies
  * exact python-float coefficient arithmetic (a/12*0.7*0.1 folds to one
    coefficient, so the folded chain is never LESS accurate)
  * non-affine subgraphs (field*field, division by a field, math ops,
    select) still evaluate correctly when mixed with affine parts
  * pinned arithmetic disables the fold (the traced op order is the
    reproducibility contract)
  * bfloat16 coefficients fold in f64 and round once
"""

import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.config import config


def _run(body, dtype="float64", n=48, interior_halo=2, seed=0):
    ntp.reset_context()
    dec = ntp.nonlinear_op_def(
        bounds=([0, 0], [n, n]),
        interior=([interior_halo, interior_halo],
                  [n - interior_halo, n - interior_halo]),
        dtype=dtype,
        name="op",
    )
    dec(body)
    cm = ntp.get_context().compiled()
    x = np.random.default_rng(seed).standard_normal((n, n))
    import jax.numpy as jnp

    xv = jnp.asarray(x, jnp.dtype(dtype))
    return np.asarray(cm.opdef("op")(xv), np.float64), x


class TestAffineFolding:
    def test_folded_matches_unfolded(self):
        def body(u):
            dudx = (-u[2, 0] + 8.0 * u[1, 0] - 8.0 * u[-1, 0] + u[-2, 0]) / 12.0
            dudy = (-u[0, 2] + 8.0 * u[0, 1] - 8.0 * u[0, -1] + u[0, -2]) / 12.0
            return u[0, 0] - 0.1 * (0.7 * dudx + 0.3 * dudy)

        assert config.fold_affine  # default on
        got, _ = _run(body)
        config.fold_affine = False
        try:
            want, _ = _run(body)
        finally:
            config.fold_affine = True
        np.testing.assert_allclose(got, want, atol=1e-14, rtol=0)

    def test_exact_coefficient_folding_f32(self):
        # (a/12)*0.7*0.1 folds to ONE f64-exact coefficient; the unfolded
        # f32 chain rounds at every step — folded must be at least as
        # close to the f64 reference
        def body(u):
            return (u[1, 0] - u[-1, 0]) / 12.0 * 0.7 * 0.1

        got32, x = _run(body, dtype="float32")
        ref = np.zeros_like(x)
        c = 0.7 * 0.1 / 12.0
        ref[2:-2, 2:-2] = c * (x[3:-1, 2:-2] - x[1:-3, 2:-2])
        ref[:2, :] = x[:2, :]
        ref[-2:, :] = x[-2:, :]
        ref[:, :2] = x[:, :2]
        ref[:, -2:] = x[:, -2:]
        interior = np.abs(got32[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert interior.max() < 1e-6

    def test_mixed_affine_nonaffine(self):
        # field*field product and division by a field must NOT fold;
        # the affine pieces around them still do
        def body(u):
            lin = 2.0 * u[1, 0] - 2.0 * u[-1, 0]
            nl = u[0, 0] * u[0, 1]
            return lin + nl / (u[0, 0] + 10.0)

        got, x = _run(body, seed=3)
        ref = x.copy()
        lin = 2.0 * x[3:-1, 2:-2] - 2.0 * x[1:-3, 2:-2]
        nl = x[2:-2, 2:-2] * x[2:-2, 3:-1]
        ref[2:-2, 2:-2] = lin + nl / (x[2:-2, 2:-2] + 10.0)
        np.testing.assert_allclose(
            got[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-12
        )

    def test_cancellation_keeps_nan_semantics(self):
        # u - u folds to a 0-coefficient term, NOT a dropped term: with
        # inf input the result must stay non-finite (0*inf = nan), the
        # same contract as the traced inf - inf
        import jax.numpy as jnp

        def body(u):
            return (u[0, 1] - u[0, 1]) + u[0, 0]

        ntp.reset_context()
        n = 48
        dec = ntp.nonlinear_op_def(
            bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]),
            dtype="float64", name="op",
        )
        dec(body)
        cm = ntp.get_context().compiled()
        x = np.ones((n, n))
        x[5, 5] = np.inf
        got = np.asarray(cm.opdef("op")(jnp.asarray(x)))
        assert not np.isfinite(got[5, 4])  # reads u[0,1] = inf

    def test_pinned_disables_fold(self):
        from neptune_tpu.lowering import jnp_backend

        calls = []
        orig = jnp_backend.eval_scalar_dag

        # pinned mode must take the eager per-op path: spy on the fold by
        # checking the result still matches (behavioral: pinned result
        # equals unpinned to roundoff; the real pin contract is covered
        # by test_precision.py — here we only pin that the flag is wired)
        def body(u):
            return 0.25 * (u[-1, 0] + u[1, 0] + u[0, -1] + u[0, 1])

        got, x = _run(body)
        config.pinned_arithmetic = True
        try:
            want, _ = _run(body)
        finally:
            config.pinned_arithmetic = False
        np.testing.assert_allclose(got, want, atol=1e-13)

    def test_bf16_folds(self):
        def body(u):
            return (u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1]) / 4.0

        got, x = _run(body, dtype="bfloat16", seed=4)
        ref = 0.25 * (x[3:-1, 2:-2] + x[1:-3, 2:-2] + x[2:-2, 3:-1] + x[2:-2, 1:-3])
        # bf16 has ~3 decimal digits
        np.testing.assert_allclose(got[2:-2, 2:-2], ref, atol=0.05)

    def test_repeated_access_dedup(self):
        # the same offset accessed twice folds into one atom with summed
        # coefficient
        def body(u):
            return u[1, 0] + u[1, 0] + 0.5 * u[1, 0]

        got, x = _run(body, seed=6)
        np.testing.assert_allclose(
            got[2:-2, 2:-2], 2.5 * x[3:-1, 2:-2], atol=1e-12
        )
