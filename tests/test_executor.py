"""Executor + pipeline tests: the reference smoke-test scenarios as pytest
numerical tests (reference tier 2, `test/smoke_tests/*.sh` — each lowered,
executed, and compared against a NumPy oracle at 1e-10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import programs
from neptune_tpu.ir import (
    F64,
    Bounds,
    FieldType,
    NeptuneBuilder,
    TempType,
    TensorType,
)
from neptune_tpu.passes import compile_ir, run_pipeline


def _rand(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n)


class TestApplySemantics:
    def _build_apply_program(self, n=8, interior=(1, 7)):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        ft = FieldType("float64", bounds)
        entry = b.make_function(
            "entry",
            "func",
            [TensorType("float64", (n,))],
            [TensorType("float64", (n,))],
        )
        b.push_block(entry.body)
        f = b.wrap(entry.body.args[0], ft)
        u = b.load(f)
        op, body = b.start_apply([u], Bounds.of([interior[0]], [interior[1]]))
        b.push_block(body)
        um1 = b.access(body.args[1], [-1])
        u0 = b.access(body.args[1], [0])
        up1 = b.access(body.args[1], [1])
        b.yield_(b.add(b.sub(um1, b.mul(b.constant(2.0, F64), u0)), up1))
        b.pop_block()
        res = b.finish_apply(op)
        b.store(res, f)
        b.return_([b.unwrap(f)])
        b.pop_block()
        return b.module

    def test_copy_through_boundary(self):
        # the boundary-semantics contract (DataflowLowering.cpp:281-287):
        # points outside the apply bounds keep the input values
        m = self._build_apply_program()
        cm = compile_ir(m)
        uin = _rand(8)
        out = np.asarray(cm.function("entry")(uin))
        expected = uin.copy()
        expected[1:7] = uin[0:6] - 2 * uin[1:7] + uin[2:8]
        np.testing.assert_allclose(out, expected, atol=1e-14)
        assert out[0] == uin[0] and out[7] == uin[7]

    def test_2d_5pt_apply(self):
        n = 12
        b = NeptuneBuilder()
        bounds = Bounds.of([0, 0], [n, n])
        interior = Bounds.of([1, 1], [n - 1, n - 1])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("lap2d", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], interior)
        b.push_block(body)
        c = b.access(body.args[2], [0, 0])
        nb = [b.access(body.args[2], o) for o in ([-1, 0], [1, 0], [0, -1], [0, 1])]
        s = nb[0]
        for x in nb[1:]:
            s = b.add(s, x)
        b.yield_(b.sub(s, b.mul(b.constant(4.0, F64), c)))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()

        cm = compile_ir(b.module)
        u = _rand((n, n))
        out = np.asarray(cm.opdef("lap2d")(u))
        expected = u.copy()
        expected[1:-1, 1:-1] = (
            u[:-2, 1:-1] + u[2:, 1:-1] + u[1:-1, :-2] + u[1:-1, 2:] - 4 * u[1:-1, 1:-1]
        )
        np.testing.assert_allclose(out, expected, atol=1e-14)

    def test_nonzero_lb_storage_normalization(self):
        # logical domain [2, 10) maps to physical [0, 8)
        # (DataflowLowering.cpp:41-104)
        n = 8
        b = NeptuneBuilder()
        bounds = Bounds.of([2], [10])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("idx", "nonlinear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        # yield the logical index as a float: out[i] = i
        iv = b.cast(body.args[0], F64)
        b.yield_(iv)
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()

        cm = compile_ir(b.module)
        out = np.asarray(cm.opdef("idx")(np.zeros(n)))
        np.testing.assert_allclose(out, np.arange(2, 10, dtype=float), atol=0)


class TestReduce:
    @pytest.mark.parametrize(
        "kind,fn",
        [
            ("sum", np.sum),
            ("max", np.max),
            ("min", np.min),
            ("l1", lambda a: np.abs(a).sum()),
            ("l2", lambda a: np.sqrt((a * a).sum())),
        ],
    )
    def test_all_kinds(self, kind, fn):
        n = 16
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        entry = b.make_function(
            "entry", "func", [TempType("float64", bounds)], [F64]
        )
        b.push_block(entry.body)
        r = b.reduce(entry.body.args[0], kind)
        b.return_([r])
        b.pop_block()
        cm = compile_ir(b.module)
        u = _rand(n, seed=4)
        np.testing.assert_allclose(float(cm.function("entry")(u)), fn(u), atol=1e-12)


class TestSmokeScenarios:
    """The five reference smoke tests as numerical golden paths."""

    def test_allen_cahn_implicit_linear(self):
        # smoke_time_advance.mlir: GMRES tol 1e-10
        m = programs.build_allen_cahn_implicit_linear()
        cm = compile_ir(m)
        uin = np.sin(np.linspace(0, np.pi, 16))
        out = np.asarray(cm.function("entry")(np.zeros(16), uin))
        oracle = programs.allen_cahn_implicit_linear_oracle(uin)
        np.testing.assert_allclose(out, oracle, atol=1e-10)

    def test_allen_cahn_implicit_linear_jitted(self):
        m = programs.build_allen_cahn_implicit_linear()
        cm = compile_ir(m)
        f = jax.jit(cm.function("entry"))
        uin = np.sin(np.linspace(0, np.pi, 16))
        out = np.asarray(f(np.zeros(16), uin))
        oracle = programs.allen_cahn_implicit_linear_oracle(uin)
        np.testing.assert_allclose(out, oracle, atol=1e-10)

    def test_black_scholes_implicit(self):
        # smoke_time_advance_bs.mlir: GMRES tol 1e-10, max 500
        m = programs.build_bs_program()
        cm = compile_ir(m)
        vin = np.maximum(np.linspace(0, 3.1, 32) - 1.0, 0.0)  # call payoff
        out = np.asarray(cm.function("entry")(np.zeros(32), vin))
        A = programs.dense_from_op(programs.bs_A_np, 32)
        oracle = np.linalg.solve(A, vin)
        # tol=1e-10 is a *relative* residual bound (PETSc rtol semantics), so
        # the absolute error bound is ~tol * ||b|| * cond(A)
        np.testing.assert_allclose(out, oracle, atol=5e-9)

    def test_allen_cahn_nonlinear_newton(self):
        # smoke_time_advance_nonlinear.mlir: Newton tol 1e-10, max 20
        m = programs.build_allen_cahn_nonlinear()
        cm = compile_ir(m)
        uin = 0.9 * np.sin(np.linspace(0, 2 * np.pi, 16))
        out = np.asarray(cm.function("entry")(np.zeros(16), uin))
        # oracle: solve F(u_next; uin) = 0 by scipy-style dense Newton
        u = uin.copy()
        for _ in range(50):
            F = programs.ac_residual_np(u, uin)
            J = np.zeros((16, 16))
            eps = 1e-7
            for j in range(16):
                du = np.zeros(16)
                du[j] = eps
                J[:, j] = (programs.ac_residual_np(u + du, uin) - F) / eps
            u = u - np.linalg.solve(J, F)
            if np.abs(programs.ac_residual_np(u, uin)).max() < 1e-12:
                break
        np.testing.assert_allclose(out, u, atol=1e-8)
        assert np.abs(programs.ac_residual_np(out, uin)).max() < 1e-10

    def test_assemble_then_solve(self):
        # smoke.mlir: assemble @A then solve_linear
        n = 16
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [n])
        interior = Bounds.of([1], [n - 1])
        tt = TempType("float64", bounds)
        ft = FieldType("float64", bounds)
        programs.build_ac_lap(b, tt, interior)
        programs.build_ac_A(b, tt, interior)
        entry = b.make_function(
            "entry",
            "func",
            [TensorType("float64", (n,)), TensorType("float64", (n,))],
            [TensorType("float64", (n,))],
        )
        b.push_block(entry.body)
        fout = b.wrap(entry.body.args[0], ft)
        fin = b.wrap(entry.body.args[1], ft)
        rhs = b.load(fin)
        A = b.assemble_matrix("ac_A")
        x = b.solve_linear(A, rhs, solver="bicgstab", tol=1e-12, max_iters=500)
        b.store(x, fout)
        b.return_([b.unwrap(fout)])
        b.pop_block()

        cm = compile_ir(b.module)
        rhs_np = _rand(n, seed=9)
        out = np.asarray(cm.function("entry")(np.zeros(n), rhs_np))
        A_np = programs.dense_from_op(lambda x: programs.ac_A_np(x, 1, n - 1), n)
        np.testing.assert_allclose(out, np.linalg.solve(A_np, rhs_np), atol=1e-9)


class TestTimeAdvanceSchemes:
    def _heat_rhs_module(self, n=32):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [n])
        interior = Bounds.of([1], [n - 1])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("heat_rhs", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], interior)
        b.push_block(body)
        um1 = b.access(body.args[1], [-1])
        u0 = b.access(body.args[1], [0])
        up1 = b.access(body.args[1], [1])
        b.yield_(b.add(b.sub(um1, b.mul(b.constant(2.0, F64), u0)), up1))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        return b, tt

    @pytest.mark.parametrize("scheme", ["euler", "rk2", "rk4"])
    def test_explicit_schemes(self, scheme):
        n = 32
        b, tt = self._heat_rhs_module(n)
        entry = b.make_function(
            "step", "func", [TempType("float64", tt.bounds)], [tt]
        )
        b.push_block(entry.body)
        u1 = b.time_advance(
            entry.body.args[0], 0.1, 0, rhs="heat_rhs", scheme=scheme
        )
        b.return_([u1])
        b.pop_block()

        cm = compile_ir(b.module)
        u = _rand(n, seed=2)
        out = np.asarray(cm.function("step")(u))

        def rhs_np(x):
            y = x.copy()
            y[1:-1] = x[:-2] - 2 * x[1:-1] + x[2:]
            return y

        dt = 0.1
        if scheme == "euler":
            expected = u + dt * rhs_np(u)
        elif scheme == "rk2":
            k1 = rhs_np(u)
            k2 = rhs_np(u + dt * k1)
            expected = u + 0.5 * dt * (k1 + k2)
        else:
            k1 = rhs_np(u)
            k2 = rhs_np(u + 0.5 * dt * k1)
            k3 = rhs_np(u + 0.5 * dt * k2)
            k4 = rhs_np(u + dt * k3)
            expected = u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_runtime_dispatch(self):
        # time_advance_runtime semantics follow the *runtime* codes
        # (NeptunePETScRuntime.cpp:637-717): 0 = pass-through, 1 = copy,
        # 2 = forward Euler
        n = 16
        b, tt = self._heat_rhs_module(n)
        from neptune_tpu.ir import I32

        entry = b.make_function(
            "step", "func", [TempType("float64", tt.bounds), I32], [tt]
        )
        b.push_block(entry.body)
        dt = b.constant(0.05, F64)
        u1 = b.time_advance_runtime(
            entry.body.args[0], dt, entry.body.args[1], "heat_rhs"
        )
        b.return_([u1])
        b.pop_block()

        cm = compile_ir(b.module)
        u = _rand(n, seed=5)

        def rhs_np(x):
            y = x.copy()
            y[1:-1] = x[:-2] - 2 * x[1:-1] + x[2:]
            return y

        np.testing.assert_allclose(np.asarray(cm.function("step")(u, 0)), u)
        np.testing.assert_allclose(np.asarray(cm.function("step")(u, 1)), u)
        np.testing.assert_allclose(
            np.asarray(cm.function("step")(u, 2)), u + 0.05 * rhs_np(u), atol=1e-13
        )


class TestPipelineDumps:
    def test_stage_dumps_available(self):
        m = programs.build_allen_cahn_implicit_linear()
        pr = run_pipeline(m)
        assert "input" in pr.dumps
        assert "verify-annotate" in pr.dumps
        assert "high-level-convertion" in pr.dumps
        # the rewrite must have eliminated time_advance
        assert "time_advance" in pr.dumps["input"]
        assert "neptune.time_advance" not in pr.dumps["high-level-convertion"]
        assert "neptune.solve_linear" in pr.dumps["high-level-convertion"]
        assert "neptune.assemble_matrix" in pr.dumps["high-level-convertion"]

    def test_pipeline_does_not_mutate_input(self):
        m = programs.build_allen_cahn_implicit_linear()
        from neptune_tpu.ir import print_module

        before = print_module(m)
        run_pipeline(m)
        assert print_module(m) == before


class TestTensorBridges:
    def test_as_tensor_from_tensor_roundtrip(self):
        # reference NeptuneIROps.td:539-596 interop bridge
        n = 8
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        entry = b.make_function("f", "func", [tt], [tt])
        b.push_block(entry.body)
        t = b.as_tensor(entry.body.args[0])
        back = b.from_tensor(t, tt)
        b.return_([back])
        b.pop_block()
        cm = compile_ir(b.module)
        x = _rand(n)
        np.testing.assert_array_equal(np.asarray(cm.function("f")(x)), x)


class TestVmapCompatibility:
    def test_vmap_over_solves(self):
        # batched parameter sweeps: vmap over an entire implicit solve
        import programs as _p

        m = _p.build_allen_cahn_implicit_linear()
        cm = compile_ir(m)
        f = cm.function("entry")
        batch = np.stack([np.sin(np.linspace(0, np.pi, 16)) * s for s in (0.5, 1.0)])
        outs = jax.vmap(lambda u: f(jnp.zeros(16), u))(jnp.asarray(batch))
        for k, s in enumerate((0.5, 1.0)):
            oracle = _p.allen_cahn_implicit_linear_oracle(batch[k])
            np.testing.assert_allclose(np.asarray(outs)[k], oracle, atol=1e-9)


class TestTimeAdvanceInterpreterParity:
    def test_nonlinear_interpreter_forwards_options(self):
        """The un-lowered interpreter path must solve with the SAME Newton
        behavior as the lowered solve_nonlinear path (review finding: it
        silently dropped jacobian= and options=). A small max_step cap
        measurably changes the trajectory at a bounded iteration count, so
        parity here proves the options reach the interpreter's solver."""
        import programs as _p
        from neptune_tpu.lowering.executor import CompiledModule
        from neptune_tpu.passes import run_pipeline

        def build(options):
            b = NeptuneBuilder()
            n = 16
            bounds = Bounds.of([0], [n])
            tt = TempType("float64", bounds)
            _src = _p.build_allen_cahn_nonlinear(n)
            # reuse the residual opdef from the canonical program
            res = _src.lookup("ac_residual")
            b.module.functions["ac_residual"] = res
            entry = b.make_function("step", "func", [tt], [tt])
            b.push_block(entry.body)
            u1 = b.time_advance(
                entry.body.args[0], 1e-2, 1, residual="ac_residual",
                solver="newton", tol=1e-13, max_iters=3, options=options,
            )
            b.return_([u1])
            b.pop_block()
            return b.module

        u0 = np.cos(np.linspace(0, 3, 16)) * 0.8
        opts = {"max_step": 1e-4, "line_search": False}
        m1 = build(opts)
        y_interp = np.asarray(CompiledModule(m1).function("step")(u0))
        y_lower = np.asarray(
            run_pipeline(build(opts)).compiled().function("step")(u0)
        )
        np.testing.assert_allclose(y_interp, y_lower, atol=1e-14)
        # and the cap genuinely bit (the uncapped solve differs)
        y_free = np.asarray(CompiledModule(build(None)).function("step")(u0))
        assert np.abs(y_free - y_interp).max() > 1e-8
