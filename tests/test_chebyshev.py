"""Chebyshev iteration — the reduction-free linear solver (no reference
counterpart; PETSc has -ksp_type chebyshev but the reference DSL surfaces
only cg/gmres/bicgstab, NeptuneIROps.td:646-684). Tests: convergence with
exact and auto-estimated spectrum bounds, the structural reduction-free
property of the check_every=0 loop, early stopping, DSL-level dispatch,
and per-solver option validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.solvers import chebyshev, cg, estimate_spectrum
from neptune_tpu.utils import tree


def poisson_1d(n):
    """1-D Dirichlet Poisson: A = tridiag(-1, 2, -1), exact spectrum
    lam_k = 2 - 2 cos(k pi / (n+1))."""

    def matvec(x):
        import jax.numpy as jnp

        xm = jnp.pad(x, 1)
        return 2.0 * x - xm[:-2] - xm[2:]

    lam_min = 2.0 - 2.0 * np.cos(np.pi / (n + 1))
    lam_max = 2.0 - 2.0 * np.cos(n * np.pi / (n + 1))
    return matvec, lam_min, lam_max


class TestChebyshev:
    def test_converges_with_exact_bounds(self):
        n = 64
        matvec, lmin, lmax = poisson_1d(n)
        b = np.random.default_rng(0).standard_normal(n)
        x, info = chebyshev(
            matvec, b, lam_min=lmin, lam_max=lmax, maxiter=800, tol=1e-10
        )
        assert bool(info.converged)
        r = b - np.asarray(matvec(x))
        assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(b)

    def test_matches_cg_solution(self):
        n = 48
        matvec, lmin, lmax = poisson_1d(n)
        b = np.random.default_rng(1).standard_normal(n)
        x_ch, _ = chebyshev(
            matvec, b, lam_min=lmin, lam_max=lmax, maxiter=700, tol=1e-12
        )
        x_cg, _ = cg(matvec, b, tol=1e-12, maxiter=500)
        np.testing.assert_allclose(np.asarray(x_ch), np.asarray(x_cg), atol=1e-8)

    def test_auto_spectrum_estimate(self):
        n = 64
        matvec, lmin, lmax = poisson_1d(n)
        b = np.random.default_rng(2).standard_normal(n)
        est = estimate_spectrum(matvec, b, iters=200)
        assert float(est.lam_max) >= lmax  # safety-inflated upper bound
        assert float(est.lam_max) <= 1.2 * lmax
        # auto-bounds solve (bounds estimated internally)
        x, info = chebyshev(matvec, b, maxiter=2500, tol=1e-8,
                            spectrum_iters=200)
        r = b - np.asarray(matvec(x))
        assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)

    def test_early_stop_with_check_every(self):
        n = 64
        matvec, lmin, lmax = poisson_1d(n)
        b = np.random.default_rng(3).standard_normal(n)
        x, info = chebyshev(
            matvec, b, lam_min=lmin, lam_max=lmax,
            maxiter=5000, tol=1e-8, check_every=25,
        )
        assert bool(info.converged)
        assert int(info.iters) < 5000

    def test_reduction_free_loop(self, monkeypatch):
        """check_every=0 must trace NO inner products or norms beyond the
        fixed overhead (tolerance setup + final residual) — the property
        that eliminates per-iteration psum collectives on a device mesh."""
        calls = {"dot": 0, "norm": 0}
        real_tdot, real_tnorm = tree.tdot, tree.tnorm

        def counting_tdot(a, b):
            calls["dot"] += 1
            return real_tdot(a, b)

        def counting_tnorm(a):
            calls["norm"] += 1
            return real_tnorm(a)

        import sys

        # the package attr `solvers.chebyshev` is shadowed by the function;
        # fetch the module itself
        ch = sys.modules["neptune_tpu.solvers.chebyshev"]
        kr = sys.modules["neptune_tpu.solvers.krylov"]

        monkeypatch.setattr(ch, "tnorm", counting_tnorm)
        monkeypatch.setattr(kr, "tnorm", counting_tnorm)
        monkeypatch.setattr(tree, "tdot", counting_tdot)

        n = 64
        matvec, lmin, lmax = poisson_1d(n)
        b = np.random.default_rng(4).standard_normal(n)
        import jax

        jax.make_jaxpr(
            lambda bb: chebyshev(
                matvec, bb, lam_min=lmin, lam_max=lmax, maxiter=200
            )
        )(b)
        # _tolerances' ||b|| + the single final ||r||; no other reductions
        # (tnorm is itself implemented via tdot, hence dot <= norm)
        assert calls["norm"] == 2
        assert calls["dot"] <= calls["norm"]

    def test_dsl_dispatch_and_options(self):
        n = 32

        @ntp.linear_op_def(
            bounds=([0, 0], [n, n]),
            interior=([1, 1], [n - 1, n - 1]),
            name="poisson_ch",
        )
        def poisson_ch(u):
            return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

        H = ntp.assemble_matrix(poisson_ch)
        b = np.random.default_rng(5).standard_normal((n, n))
        x = np.asarray(
            ntp.solve_linear(
                H, b, solver="chebyshev", tol=1e-8, max_iters=4000,
                options={"lam_max": 8.0, "lam_min": 5e-3, "check_every": 50},
            )
        )
        r = b - np.asarray(H.matvec(x))
        # the copy-through ring is identity; compare on the full residual
        assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(b)

    def test_option_validation(self):
        from neptune_tpu.utils.options import linear_option_kwargs

        with pytest.raises(ValueError, match="only applies to solver='chebyshev'"):
            linear_option_kwargs("cg", {"lam_max": 4.0})
        with pytest.raises(ValueError, match="does not apply"):
            linear_option_kwargs("chebyshev", {"divtol": 1e5})
        kw = linear_option_kwargs(
            "chebyshev", {"lam_min": 0.1, "lam_max": 4.0, "check_every": 10}
        )
        assert kw == {"lam_min": 0.1, "lam_max": 4.0, "check_every": 10}


class TestResidualReplacement:
    """f32 drift control (ROADMAP "Numerics"): over thousands of f32
    iterations the recurrence residual diverges ~1e-5 relative from the
    true b - A·x. Automatic replacement (default) rebases the recurrence
    on the true residual at every check boundary, making both the
    convergence test and the reported resnorm drift-free."""

    N = 256

    def _mv(self, u):
        z = jnp.zeros_like(u)
        c = (
            4.0 * u[1:-1, 1:-1] - u[:-2, 1:-1] - u[2:, 1:-1]
            - u[1:-1, :-2] - u[1:-1, 2:]
        )
        return (
            z.at[1:-1, 1:-1].set(c)
            .at[0, :].set(u[0, :]).at[-1, :].set(u[-1, :])
            .at[1:-1, 0].set(u[1:-1, 0]).at[1:-1, -1].set(u[1:-1, -1])
        )

    def _problem(self):
        n = self.N
        rng = np.random.default_rng(0)
        b = np.zeros((n, n), np.float32)
        b[1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2))
        lam_min = float(4 - 4 * np.cos(np.pi / (n - 1)))
        return jnp.asarray(b), lam_min, 8.0

    def test_without_replacement_claims_drift(self):
        """The drift is real: opting OUT, the recurrence claims convergence
        at a tol BELOW the f32 attainable floor (~1.3e-5 here) while the
        true residual is several times larger (measured 6.2e-6 vs 3.2e-5)."""
        b, lam_min, lam_max = self._problem()
        x, info = jax.jit(
            lambda b: chebyshev(
                self._mv, b, tol=1e-5, maxiter=6000, check_every=100,
                lam_min=lam_min, lam_max=lam_max, residual_replacement=False,
            )
        )(b)
        true = jnp.linalg.norm(b - self._mv(x))
        assert bool(info.converged)  # the recurrence *claims* success...
        assert float(true) / float(info.resnorm) > 2.0  # ...but lies >2x

    def test_replacement_reports_true_residual(self):
        """Default mode: honest reporting AND genuine convergence at a tol
        above the f32 floor."""
        b, lam_min, lam_max = self._problem()
        x, info = jax.jit(
            lambda b: chebyshev(
                self._mv, b, tol=4e-5, maxiter=6000, check_every=100,
                lam_min=lam_min, lam_max=lam_max,
            )
        )(b)
        bn = float(jnp.linalg.norm(b))
        true = float(jnp.linalg.norm(b - self._mv(x)))
        assert bool(info.converged)
        assert abs(float(info.resnorm) - true) / true < 0.05
        assert true / bn <= 4e-5 * 1.05

    def test_replace_every_reduction_free(self):
        """replace_every rebases inside the reduction-free fori_loop; the
        solve still matches the drift-free answer."""
        b, lam_min, lam_max = self._problem()
        x, info = jax.jit(
            lambda b: chebyshev(
                self._mv, b, tol=4e-5, maxiter=1000, check_every=0,
                replace_every=100, lam_min=lam_min, lam_max=lam_max,
            )
        )(b)
        true = float(jnp.linalg.norm(b - self._mv(x)))
        assert abs(float(info.resnorm) - true) / max(true, 1e-30) < 0.05
