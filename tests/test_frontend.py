"""Frontend DSL tests — the reference `test/python_tests/` scenarios as real
asserting tests (the reference's are print-only demos), including the
aspirational SWE implicit API (`test_swe_implicit.py`) that the reference
documents but cannot run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp


@pytest.fixture(autouse=True)
def fresh_context():
    ntp.reset_context()
    yield
    ntp.reset_context()


def make_lap(n=64):
    @ntp.linear_op_def(bounds=([0], [n]), interior=([1], [n - 1]))
    def lap(u):
        return 2.0 * u[0] - u[-1] - u[1]

    return lap


def lap_np(x):
    y = x.copy()
    y[1:-1] = 2 * x[1:-1] - x[:-2] - x[2:]
    return y


class TestOpDef:
    def test_trace_and_dump(self):
        # the reference test_user.py flow
        lap = make_lap(100)
        H = ntp.assemble_matrix(lap)
        dump = ntp.get_compiler().dump()
        assert "neptune.linear_opdef @lap" in dump
        assert "neptune.access" in dump
        assert H.n == 100

    def test_eager_matvec(self):
        lap = make_lap()
        x = np.random.default_rng(0).standard_normal(64)
        np.testing.assert_allclose(np.asarray(lap(x)), lap_np(x), atol=1e-14)

    def test_opdef_2d(self):
        @ntp.linear_op_def(bounds=([0, 0], [16, 16]), interior=([1, 1], [15, 15]))
        def lap2d(u):
            return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

        x = np.random.default_rng(1).standard_normal((16, 16))
        y = np.asarray(lap2d(x))
        expected = x.copy()
        expected[1:-1, 1:-1] = (
            4 * x[1:-1, 1:-1] - x[:-2, 1:-1] - x[2:, 1:-1] - x[1:-1, :-2] - x[1:-1, 2:]
        )
        np.testing.assert_allclose(y, expected, atol=1e-14)

    def test_linear_capture_rejected(self):
        captured = ntp.temp(np.ones(8))
        with pytest.raises(TypeError, match="captured"):

            @ntp.linear_op_def(bounds=([0], [8]))
            def bad(u):
                return u[0] + captured[0]

    def test_nonlinearity_rejected_in_linear(self):
        from neptune_tpu.ir import IRError

        with pytest.raises(IRError, match="linearity|mul"):

            @ntp.linear_op_def(bounds=([0], [8]))
            def sq(u):
                return u[0] * u[0]

    def test_nonlinear_op_def_with_math(self):
        @ntp.nonlinear_op_def(bounds=([0], [16]))
        def react(u):
            return ntp.tanh(u[0]) + u[0] * u[1] if False else ntp.tanh(u[0])

        x = np.random.default_rng(2).standard_normal(16)
        np.testing.assert_allclose(np.asarray(react(x)), np.tanh(x), atol=1e-14)


class TestSolveLinear:
    def test_eager_solvers(self):
        lap = make_lap()
        H = ntp.assemble_matrix(lap)
        b = np.random.default_rng(1).standard_normal(64)
        for solver in ("gmres", "bicgstab"):
            sol = ntp.solve_linear(H, b, solver=solver, tol=1e-13, max_iters=3000)
            assert np.abs(lap_np(np.asarray(sol)) - b).max() < 1e-9, solver

    def test_gmres_through_opdef_matvec_regression(self):
        # regression: XLA CPU dynamic-update-slice aliasing miscompilation
        # corrupted Arnoldi vectors when the operator ended in x.at[sl].set
        # (fixed by mask-select copy-through in jnp_backend.execute_apply)
        lap = make_lap()
        H = ntp.assemble_matrix(lap)
        b = jnp.asarray(np.random.default_rng(1).standard_normal(64))
        from neptune_tpu.solvers.krylov import gmres

        x, info = gmres(H.matvec, b, tol=1e-12, maxiter=2000, restart=30)
        true_res = float(jnp.linalg.norm(b - H.matvec(x)))
        assert abs(true_res - float(info.resnorm)) < 1e-8
        assert true_res < 1e-10

    def test_direct_solver(self):
        lap = make_lap(16)
        H = ntp.assemble_matrix(lap)
        b = np.random.default_rng(3).standard_normal(16)
        sol = ntp.solve_linear(H, b, solver="direct")
        np.testing.assert_allclose(lap_np(np.asarray(sol)), b, atol=1e-10)

    def test_dense_assembly(self):
        lap = make_lap(12)
        H = ntp.assemble_matrix(lap)
        A = np.asarray(H.dense())
        expected = np.eye(12)
        for i in range(1, 11):
            expected[i, i] = 2.0
            expected[i, i - 1] = -1.0
            expected[i, i + 1] = -1.0
        np.testing.assert_allclose(A, expected, atol=1e-14)


class TestJitClass:
    def test_heat_solver(self):
        # the reference test_jit.py flow, but actually executing with data
        lap = make_lap()

        @ntp.jit_class
        class HeatSolver:
            def __init__(self, dt):
                self.dt = dt
                self.H = ntp.assemble_matrix(lap)

            def step(self, u):
                return ntp.solve_linear(
                    self.H, u, solver="bicgstab", tol=1e-13, max_iters=3000
                )

        solver = HeatSolver(dt=0.01)
        u = np.random.default_rng(2).standard_normal(64)
        out = np.asarray(solver.step(u))
        assert np.abs(lap_np(out) - u).max() < 1e-9
        # second call goes through the cached jitted path deterministically
        out2 = np.asarray(solver.step(u))
        np.testing.assert_array_equal(out, out2)

    def test_traced_ir_has_method_function(self):
        lap = make_lap(32)

        @ntp.jit_class
        class S:
            def __init__(self):
                self.H = ntp.assemble_matrix(lap)

            def apply_op(self, u):
                return ntp.solve_linear(self.H, u, solver="bicgstab", tol=1e-10)

        s = S()
        s.apply_op(np.ones(32))
        dump = ntp.get_compiler().dump()
        assert "func @S_apply_op" in dump
        assert "neptune.solve_linear" in dump


class TestApplyDecorator:
    def test_eager_apply(self):
        u = np.random.default_rng(0).standard_normal(32)

        result = ntp.apply(inputs=[u], bounds=([1], [31]))(
            lambda t: t[-1] - 2.0 * t[0] + t[1]
        )
        arr = np.asarray(result.node.concrete)
        expected = u.copy()
        expected[1:31] = u[0:30] - 2 * u[1:31] + u[2:32]
        np.testing.assert_allclose(arr, expected, atol=1e-14)

    def test_apply_with_index_and_where(self):
        u = np.ones(16)

        result = ntp.apply(inputs=[u], bounds=([0], [16]))(
            lambda t: ntp.where(ntp.index(0) == 0, t[0] * 10.0, t[0])
        )
        arr = np.asarray(result.node.concrete)
        assert arr[0] == 10.0
        assert np.all(arr[1:] == 1.0)


class TestSolveNonlinear:
    def test_swe_implicit_step(self):
        # the aspirational reference API (test_swe_implicit.py:83-89):
        # closure residual, tuple state, newton-krylov
        g = 9.81
        dt, dx = 0.05, 1.0
        n = 32
        h0 = ntp.temp(np.ones(n) + 0.1 * np.exp(-((np.arange(n) - 16.0) ** 2) / 8))
        q0 = ntp.temp(np.zeros(n))

        def swe_residual(h, q):
            fh = q
            fq = (q * q) / h + 0.5 * g * (h * h)
            div_fh = (fh[1] - fh[-1]) / (2.0 * dx)
            div_fq = (fq[1] - fq[-1]) / (2.0 * dx)
            dt_h = (h[0] - h0[0]) / dt
            dt_q = (q[0] - q0[0]) / dt
            i = ntp.index(0)
            isb = (i == 0) | (i == n - 1)
            return (
                ntp.where(isb, h[0] - h0[0], dt_h + div_fh),
                ntp.where(isb, q[0] - q0[0], dt_q + div_fq),
            )

        h1, q1 = ntp.solve_nonlinear(
            swe_residual, initial_guess=(h0, q0), method="newton-krylov", tol=1e-11
        )
        h1, q1 = np.asarray(h1), np.asarray(q1)

        def res_np(h, q):
            h0a = np.asarray(h0.node.concrete)
            q0a = np.asarray(q0.node.concrete)
            fh, fq = q, q * q / h + 0.5 * g * h * h
            rh = (h - h0a) / dt + (np.roll(fh, -1) - np.roll(fh, 1)) / (2 * dx)
            rq = (q - q0a) / dt + (np.roll(fq, -1) - np.roll(fq, 1)) / (2 * dx)
            rh[0], rh[-1] = h[0] - h0a[0], h[-1] - h0a[-1]
            rq[0], rq[-1] = q[0] - q0a[0], q[-1] - q0a[-1]
            return rh, rq

        rh, rq = res_np(h1, q1)
        assert np.abs(rh).max() < 1e-10
        assert np.abs(rq).max() < 1e-10

    def test_single_state(self):
        u0 = np.zeros(16)

        def residual(u):
            return u[0] * u[0] * u[0] + u[0] - 2.0

        u = ntp.solve_nonlinear(residual, u0, tol=1e-13)
        np.testing.assert_allclose(np.asarray(u), 1.0, atol=1e-11)

    def test_traced_solve_nonlinear_in_jit_class(self):
        n = 16

        @ntp.jit_class
        class ImplicitSolver:
            def step(self, u_prev):
                def residual(u):
                    i = ntp.index(0)
                    isb = (i == 0) | (i == n - 1)
                    lap = u[-1] - 2.0 * u[0] + u[1]
                    interior = u[0] - u_prev[0] - 0.1 * lap
                    return ntp.where(isb, u[0] - u_prev[0], interior)

                return ntp.solve_nonlinear(residual, u_prev, tol=1e-12)

        s = ImplicitSolver()
        u = np.sin(np.linspace(0, np.pi, n))
        out = np.asarray(s.step(u))
        # verify residual of the solved state
        lap = np.zeros(n)
        lap[1:-1] = out[:-2] - 2 * out[1:-1] + out[2:]
        r = out - u - 0.1 * lap
        r[0] = out[0] - u[0]
        r[-1] = out[-1] - u[-1]
        assert np.abs(r).max() < 1e-10


class TestReduceAndTimeAdvance:
    def test_eager_reduce(self):
        x = np.random.default_rng(5).standard_normal(32)
        assert abs(float(ntp.reduce(x, "sum")) - x.sum()) < 1e-12
        assert abs(float(ntp.reduce(x, "l2")) - np.sqrt((x * x).sum())) < 1e-12

    def test_eager_time_advance_explicit(self):
        lap = make_lap(32)
        u = np.random.default_rng(6).standard_normal(32)
        out = np.asarray(ntp.time_advance(u, 0.1, "explicit", rhs=lap))
        np.testing.assert_allclose(out, u + 0.1 * lap_np(u), atol=1e-13)

    def test_eager_time_advance_implicit_linear(self):
        lap = make_lap(32)
        u = np.random.default_rng(7).standard_normal(32)
        out = np.asarray(
            ntp.time_advance(
                u, 0.1, "implicit_linear", system=lap, solver="bicgstab", tol=1e-13,
                max_iters=2000,
            )
        )
        np.testing.assert_allclose(lap_np(out), u, atol=1e-9)


class TestJitCompile:
    def test_compiled_library(self):
        lap = make_lap(32)

        @ntp.jit_class
        class S:
            def __init__(self):
                self.H = ntp.assemble_matrix(lap)

            def solve(self, u):
                return ntp.solve_linear(self.H, u, solver="bicgstab", tol=1e-12)

        s = S()
        u = np.random.default_rng(8).standard_normal(32)
        s.solve(u)  # trace
        lib = ntp.jit_compile(ntp.get_compiler())
        assert "S_solve" in lib.function_names()
        out = np.asarray(lib.S_solve(u))
        assert np.abs(lap_np(out) - u).max() < 1e-8


class TestBoundaryPredicates:
    def test_on_boundary_1d(self):
        @ntp.nonlinear_op_def(bounds=([2], [10]))
        def f(u):
            return ntp.where(ntp.on_boundary(u), 0.0 * u[0], u[0])

        y = np.asarray(f(np.ones(8)))
        expected = np.ones(8)
        expected[0] = expected[-1] = 0.0
        np.testing.assert_array_equal(y, expected)

    def test_on_boundary_width_2(self):
        @ntp.nonlinear_op_def(bounds=([0, 0], [8, 8]))
        def f(u):
            return ntp.where(ntp.on_boundary(u, width=2), 0.0 * u[0, 0], u[0, 0])

        y = np.asarray(f(np.ones((8, 8))))
        assert np.all(y[:2, :] == 0) and np.all(y[:, -2:] == 0)
        assert np.all(y[2:-2, 2:-2] == 1)

    def test_interior_complement(self):
        @ntp.nonlinear_op_def(bounds=([0], [8]))
        def f(u):
            return ntp.where(ntp.interior(u), u[0], 0.0 * u[0])

        y = np.asarray(f(np.ones(8)))
        expected = np.ones(8)
        expected[0] = expected[-1] = 0.0
        np.testing.assert_array_equal(y, expected)


class TestJitClassShapes:
    def test_different_shapes_retrace(self):
        # calling a jit_class method with a new shape must re-trace, not
        # crash against the first trace's declared types
        @ntp.jit_class
        class S:
            def double(self, u):
                return ntp.apply(inputs=[u], bounds=([0], [u.node.ttype.bounds.ub[0]]))(
                    lambda t: t[0] * 2.0
                )

        s = S()
        a = np.asarray(s.double(np.ones(8)))
        b = np.asarray(s.double(np.ones(16)))
        assert a.shape == (8,) and b.shape == (16,)
        np.testing.assert_allclose(a, 2.0)
        np.testing.assert_allclose(b, 2.0)


class TestOpDefCaptures:
    def test_capture_closing_opdef_is_callable(self):
        """Review: the linear-capture error recommends nonlinear_op_def for
        captured temps, but calling the returned handle failed on arity
        (captures are appended to the traced signature). The handle now
        supplies them automatically."""
        ntp.reset_context()
        n = 16
        coef = ntp.temp(np.linspace(0.5, 1.5, n))

        @ntp.nonlinear_op_def(
            bounds=([0], [n]), interior=([1], [n - 1]), name="capop"
        )
        def capop(u):
            return coef[0] * (2.0 * u[0] - u[-1] - u[1])

        x = np.random.default_rng(0).standard_normal(n)
        y = np.asarray(capop(x))
        c = np.linspace(0.5, 1.5, n)
        expect = x.copy()
        expect[1:-1] = c[1:-1] * (2 * x[1:-1] - x[:-2] - x[2:])
        np.testing.assert_allclose(y, expect, atol=1e-12)
        ntp.reset_context()

    def test_linear_capture_rejection_cleans_symbol(self):
        """Review: the linear temp-capture TypeError left the broken opdef
        in the module, so fixing the kernel hit 'symbol redefinition'."""
        ntp.reset_context()
        n = 8
        other = ntp.temp(np.ones(n))

        with pytest.raises(TypeError, match="captured temps"):

            @ntp.linear_op_def(
                bounds=([0], [n]), interior=([1], [n - 1]), name="badcap"
            )
            def badcap(u):
                return other[0] * u[0]

        # the symbol is free again: redefining under the same name works
        @ntp.linear_op_def(
            bounds=([0], [n]), interior=([1], [n - 1]), name="badcap"
        )
        def badcap2(u):
            return 2.0 * u[0] - u[-1] - u[1]

        assert np.asarray(badcap2(np.ones(n))).shape == (n,)
        ntp.reset_context()
