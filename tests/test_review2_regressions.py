"""Regression tests for the second review round: scalar-capture lifting,
structure-key cast soundness, eager reduce/apply bounds handling, Expr truth
value, printer/parser constant round-trip, eager opdef dedup."""

import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.ir import BOOL, Bounds, F64, NeptuneBuilder, TempType, print_module
from neptune_tpu.ir.parser import parse_module
from neptune_tpu.ir.verify import _structure_key


@pytest.fixture(autouse=True)
def fresh():
    ntp.reset_context()
    yield
    ntp.reset_context()


class TestScalarCaptures:
    def test_traced_dt_in_residual_closure(self):
        # a traced scalar arg used inside a solve_nonlinear closure used to
        # raise "scalar reference is not bound in this kernel"
        n = 16

        @ntp.jit_class
        class S:
            def step(self, u_prev, dt):
                def residual(u):
                    lap = u[-1] - 2.0 * u[0] + u[1]
                    inner = u[0] - u_prev[0] - dt * lap
                    return ntp.where(ntp.on_boundary(u), u[0] - u_prev[0], inner)

                return ntp.solve_nonlinear(residual, u_prev, tol=1e-12)

        s = S()
        u = np.sin(np.linspace(0, np.pi, n))
        out = np.asarray(s.step(u, 0.1))
        lap = np.zeros(n)
        lap[1:-1] = out[:-2] - 2 * out[1:-1] + out[2:]
        r = out - u - 0.1 * lap
        r[0] = out[0] - u[0]
        r[-1] = out[-1] - u[-1]
        assert np.abs(r).max() < 1e-10
        # the dt value is a runtime argument: a different dt changes the result
        out2 = np.asarray(s.step(u, 0.05))
        assert np.abs(out - out2).max() > 1e-6

    def test_eager_scalar_capture(self):
        dt = 0.25  # python float -> baked constant, still fine
        u0 = np.linspace(0, 1, 8)

        def residual(u):
            return u[0] - u0[3] * 0.0 - dt  # trivially solvable

        u = np.asarray(ntp.solve_nonlinear(residual, np.zeros(8), tol=1e-13))
        np.testing.assert_allclose(u, dt, atol=1e-11)

    def test_decorator_rejects_traced_scalar_capture(self):
        @ntp.jit_class
        class S:
            def step(self, u, dt):
                @ntp.nonlinear_op_def(bounds=([0], [8]), name="leaky")
                def leaky(v):
                    return v[0] * dt  # traced scalar captured in a decorator

                return u

        s = S()
        with pytest.raises(TypeError, match="captured traced scalars"):
            s.step(np.zeros(8), 0.1)


class TestStructureKeySoundness:
    def test_cast_target_differentiates(self):
        def mk(to):
            b = NeptuneBuilder()
            tt = TempType("float64", Bounds.of([0], [8]))
            fn = b.make_opdef("f", "nonlinear_opdef", [tt], [tt])
            b.push_block(fn.body)
            op, body = b.start_apply([fn.body.args[0]], tt.bounds)
            b.push_block(body)
            u = b.access(body.args[1], [0])
            v = b.cast(b.cast(u, to), F64)
            b.yield_(v)
            b.pop_block()
            b.return_([b.finish_apply(op)])
            b.pop_block()
            return _structure_key(fn)

        from neptune_tpu.ir.types import F32, ScalarType

        assert mk(F32) != mk(ScalarType("bfloat16"))


class TestEagerSemantics:
    def test_eager_reduce_logical_bounds(self):
        t = ntp.temp(np.arange(8.0), lb=[1])  # logical domain [1, 9)
        # logical [1,5) = physical [0,4) = values 0+1+2+3
        assert float(ntp.reduce(t, "sum", bounds=([1], [5]))) == 6.0

    def test_eager_apply_multi_output(self):
        u = np.arange(8.0)
        r = ntp.apply(inputs=[u], bounds=([1], [7]))(
            lambda t: (t[0] + 1.0, t[0] * 2.0)
        )
        assert isinstance(r, tuple) and len(r) == 2
        a = np.asarray(r[0].node.concrete)
        b = np.asarray(r[1].node.concrete)
        np.testing.assert_allclose(a[1:7], u[1:7] + 1)
        np.testing.assert_allclose(b[1:7], u[1:7] * 2)

    def test_eager_opdef_dedup(self):
        u0 = np.zeros(8)

        def residual(u):
            return u[0] - 1.0

        n_before = len(ntp.get_context().module.functions)
        for _ in range(5):
            ntp.solve_nonlinear(residual, u0, tol=1e-12)
        n_after = len(ntp.get_context().module.functions)
        assert n_after == n_before + 1  # one symbol, not five


class TestExprTruthValue:
    def test_bool_raises(self):
        with pytest.raises(TypeError, match="truth value"):
            bool(ntp.index(0) < 2)

    def test_python_or_raises_not_silently_wrong(self):
        with pytest.raises(TypeError):
            (ntp.index(0) < 2) or (ntp.index(0) > 5)


class TestConstantRoundTrip:
    def test_bool_and_inf_constants(self):
        b = NeptuneBuilder()
        tt = TempType("float64", Bounds.of([0], [4]))
        fn = b.make_opdef("c", "nonlinear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], tt.bounds)
        b.push_block(body)
        cond = b.constant(True, BOOL)
        big = b.constant(float("inf"), F64)
        u = b.access(body.args[1], [0])
        b.yield_(b.select(cond, b.minimum(u, big), u))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        d1 = print_module(b.module)
        m2 = parse_module(d1)
        assert print_module(m2) == d1


class TestTimeAdvanceTracedDt:
    def test_dt_as_traced_arg(self):
        @ntp.linear_op_def(bounds=([0], [16]), interior=([1], [15]), name="r")
        def rhs(u):
            return u[-1] - 2.0 * u[0] + u[1]

        @ntp.jit_class
        class S:
            def step(self, u, dt):
                return ntp.time_advance(u, dt, "explicit", rhs="r")

        s = S()
        u = np.random.default_rng(0).standard_normal(16)
        out = np.asarray(s.step(u, 0.1))
        # reference semantics: k = rhs(u) with copy-through (k = u at the
        # boundary), and the combination u + dt*k spans the full domain
        # (HighLevelConvertion.cpp:96-117 emits it without a bounds attr)
        k = u.copy()
        k[1:-1] = u[:-2] - 2 * u[1:-1] + u[2:]
        np.testing.assert_allclose(out, u + 0.1 * k, atol=1e-12)
        # dt really is a runtime value
        out2 = np.asarray(s.step(u, 0.2))
        np.testing.assert_allclose(out2, u + 0.2 * k, atol=1e-12)
