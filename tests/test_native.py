"""Native C++ runtime tests: codegen -> g++ -> ctypes, cross-validated against
both the NumPy oracles and the JAX executor (three-way agreement — the native
path is this build's analog of the reference's compiled-kernel + PETSc
runtime, and doubles as an independent oracle)."""

import shutil

import numpy as np
import pytest

import programs
from neptune_tpu.passes import compile_ir
from neptune_tpu.runtime import CodegenError, compile_native, generate_cpp

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="needs a C++ compiler"
)


class TestNativeScenarios:
    def test_allen_cahn_implicit_linear(self):
        m = programs.build_allen_cahn_implicit_linear()
        nm = compile_native(m)
        uin = np.sin(np.linspace(0, np.pi, 16))
        out = nm.function("entry")(np.zeros(16), uin)
        oracle = programs.allen_cahn_implicit_linear_oracle(uin)
        np.testing.assert_allclose(out, oracle, atol=1e-10)

    def test_allen_cahn_newton(self):
        m = programs.build_allen_cahn_nonlinear()
        nm = compile_native(m)
        uin = 0.9 * np.sin(np.linspace(0, 2 * np.pi, 16))
        out = nm.function("entry")(np.zeros(16), uin)
        assert np.abs(programs.ac_residual_np(out, uin)).max() < 1e-10

    def test_black_scholes(self):
        m = programs.build_bs_program()
        nm = compile_native(m)
        vin = np.maximum(np.linspace(0, 3.1, 32) - 1.0, 0.0)
        out = nm.function("entry")(np.zeros(32), vin)
        A = programs.dense_from_op(programs.bs_A_np, 32)
        np.testing.assert_allclose(out, np.linalg.solve(A, vin), atol=5e-9)

    def test_native_matches_jax_executor(self):
        # three-way agreement: native C++ vs JAX executor (both already
        # checked against NumPy separately)
        m = programs.build_allen_cahn_implicit_linear()
        nm = compile_native(m)
        cm = compile_ir(m)
        uin = np.cos(np.linspace(0, 3, 16))
        a = nm.function("entry")(np.zeros(16), uin)
        b = np.asarray(cm.function("entry")(np.zeros(16), uin))
        np.testing.assert_allclose(a, b, atol=1e-9)

    def test_caller_arrays_not_mutated(self):
        m = programs.build_allen_cahn_implicit_linear()
        nm = compile_native(m)
        uin = np.sin(np.linspace(0, np.pi, 16))
        keep = uin.copy()
        out_buf = np.zeros(16)
        nm.function("entry")(out_buf, uin)
        np.testing.assert_array_equal(uin, keep)
        np.testing.assert_array_equal(out_buf, np.zeros(16))

    def test_source_loops_match_reference_structure(self):
        # the generated code is loop nests with storage normalization, the
        # reference's scf.for lowering shape (DataflowLowering.cpp:258-448)
        m = programs.build_allen_cahn_implicit_linear()
        from neptune_tpu.passes import run_pipeline

        src = generate_cpp(run_pipeline(m).module)
        assert "for (long i0 = 1L; i0 < 15L; ++i0)" in src
        assert "neptune_rt_gmres" in src
        assert 'extern "C" void nt_entry' in src

    def test_f32_module_rejected(self):
        import neptune_tpu as ntp

        ntp.reset_context()

        @ntp.linear_op_def(bounds=([0], [8]), dtype="float32")
        def op32(u):
            return u[0] * 2.0

        with pytest.raises(CodegenError, match="float64"):
            generate_cpp(ntp.get_context().module)
        ntp.reset_context()

    def test_cache_hit(self):
        m = programs.build_allen_cahn_implicit_linear()
        nm1 = compile_native(m)
        nm2 = compile_native(m)  # second compile must hit the .so cache
        uin = np.sin(np.linspace(0, np.pi, 16))
        a = nm1.function("entry")(np.zeros(16), uin)
        b = nm2.function("entry")(np.zeros(16), uin)
        np.testing.assert_array_equal(a, b)


class TestNativePreconditioning:
    def test_jacobi_cg_native(self):
        # native Jacobi used to be silently dropped (nullptr inv_diag)
        import neptune_tpu as ntp

        ntp.reset_context()
        n = 64

        @ntp.linear_op_def(
            bounds=([0], [n]), interior=([1], [n - 1]), name="scaled_lap"
        )
        def scaled_lap(u):
            # SPD: variable diagonal shift + symmetric laplacian part
            i = ntp.index(0)
            c = 2.0 + (i * 1.0) * 0.05
            return c * u[0] + (2.0 * u[0] - u[-1] - u[1])

        b = ntp.get_context().builder
        from neptune_tpu.ir import TempType, Bounds, TensorType

        tt = TempType("float64", Bounds.of([0], [n]))
        entry = b.make_function("entry", "func", [tt], [tt])
        b.push_block(entry.body)
        A = b.assemble_matrix("scaled_lap")
        x = b.solve_linear(
            A, entry.body.args[0], solver="cg", tol=1e-12, max_iters=5000,
            precond="jacobi",
        )
        b.return_([x])
        b.pop_block()
        ntp.get_context().bump()

        nm = compile_native(ntp.get_context().module, keep_source=True)
        assert "jp_inv" in nm.source  # probing code was emitted
        rhs = np.random.default_rng(0).standard_normal(n)
        out = nm.function("entry")(rhs)
        # residual check via the jax opdef
        mv = ntp.get_context().compiled().opdef("scaled_lap")
        res = np.abs(np.asarray(mv(out)) - rhs).max()
        assert res < 1e-8
        ntp.reset_context()

    def test_unsupported_precond_rejected(self):
        import neptune_tpu as ntp
        from neptune_tpu.ir import Bounds, TempType

        ntp.reset_context()

        @ntp.linear_op_def(bounds=([0], [16]), interior=([1], [15]), name="l2")
        def l2(u):
            return 2.0 * u[0] - u[-1] - u[1]

        b = ntp.get_context().builder
        tt = TempType("float64", Bounds.of([0], [16]))
        entry = b.make_function("entry", "func", [tt], [tt])
        b.push_block(entry.body)
        A = b.assemble_matrix("l2")
        x = b.solve_linear(
            A, entry.body.args[0], solver="gmres", precond="jacobi"
        )
        b.return_([x])
        b.pop_block()
        with pytest.raises(CodegenError, match="jacobi.*cg|cg.*jacobi"):
            generate_cpp(
                __import__("neptune_tpu.passes", fromlist=["run_pipeline"])
                .run_pipeline(ntp.get_context().module)
                .module
            )
        ntp.reset_context()


class TestCrossBackendScalarSemantics:
    """Review regressions: integer-typed arith.div and select() typing must
    agree between the JAX backend and the native C++ oracle."""

    @staticmethod
    def _entry_module(build_body, n=16):
        """Module with entry(t: temp) -> temp whose apply body is built by
        build_body(b, body_block) -> yielded scalar Value."""
        from neptune_tpu.ir import Bounds, NeptuneBuilder, TempType

        b = NeptuneBuilder()
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        entry = b.make_function("entry", "func", [tt], [tt])
        b.push_block(entry.body)
        op, body = b.start_apply([entry.body.args[0]], bounds)
        b.push_block(body)
        b.yield_(build_body(b, body))
        b.pop_block()
        out = b.finish_apply(op)
        b.return_([out])
        b.pop_block()
        return b.module, n

    def _run_both(self, build_body, x):
        m, n = self._entry_module(build_body, n=len(x))
        cm = compile_ir(m, backend="auto")
        y_jax = np.asarray(cm.function("entry")(x))
        nm = compile_native(m)
        y_nat = np.asarray(nm.function("entry")(x))
        return y_jax, y_nat

    def test_index_division_truncates_on_both_backends(self):
        from neptune_tpu.ir import INDEX

        def body(b, blk):
            # (i / 2) * 2 == i holds exactly on EVEN rows iff / truncates;
            # true division would make it hold everywhere
            i = blk.args[0]
            two = b.constant(2, INDEX)
            even = b.cmp("eq", b.mul(b.div(i, two), two), i)
            u = b.access(blk.args[1], [0])
            from neptune_tpu.ir import F64

            return b.select(even, u, b.constant(0.0, F64))

        x = np.arange(1.0, 17.0)
        y_jax, y_nat = self._run_both(body, x)
        expect = np.where(np.arange(16) % 2 == 0, x, 0.0)
        np.testing.assert_allclose(y_jax, expect, atol=1e-12)
        np.testing.assert_allclose(y_nat, expect, atol=1e-12)

    def test_where_promotes_across_branches(self):
        import neptune_tpu as ntp

        ntp.reset_context()
        n = 12

        @ntp.nonlinear_op_def(
            bounds=([0], [n]), interior=([0], [n]), name="mixed"
        )
        def mixed(u):
            i = ntp.index(0)
            # index-typed first branch + float second branch: the Select
            # must be float-typed (native codegen would otherwise truncate
            # the float branch through a long variable)
            return ntp.where(i < 4, i, u[0])

        cm = ntp.get_context().compiled()
        x = np.linspace(0.25, 3.0, n)
        expect = np.where(np.arange(n) < 4, np.arange(n, dtype=float), x)
        y_jax = np.asarray(cm.opdef("mixed")(x))
        np.testing.assert_allclose(y_jax, expect, atol=1e-12)
        # and the emitted native code for the opdef must not route the
        # select through an integer variable
        src_cpp = generate_cpp(
            __import__("neptune_tpu.passes", fromlist=["run_pipeline"])
            .run_pipeline(ntp.get_context().module)
            .module
        )
        ntp.reset_context()

    def test_field_typed_return_native(self):
        """Review pair: cgen used to emit an ill-formed pointer cast for a
        FieldType return, and aot allocated a 1-element buffer the memcpy
        then overflowed. A func returning the field it stored into must
        compile and round the values through intact."""
        import neptune_tpu as ntp
        from neptune_tpu.ir import Bounds, FieldType, NeptuneBuilder, TempType

        ntp.reset_context()
        b = ntp.get_context().builder
        n = 16
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        ft = FieldType("float64", bounds)
        from neptune_tpu.ir import TensorType

        entry = b.make_function(
            "entry", "func", [TensorType("float64", (n,))], [ft]
        )
        b.push_block(entry.body)
        f = b.wrap(entry.body.args[0], ft)
        u = b.load(f)
        op, body = b.start_apply([u], Bounds.of([1], [n - 1]))
        b.push_block(body)
        u0 = b.access(body.args[1], [0])
        from neptune_tpu.ir import F64

        b.yield_(b.mul(b.constant(3.0, F64), u0))
        b.pop_block()
        t = b.finish_apply(op)
        b.store(t, f)
        b.return_([f])
        b.pop_block()
        ntp.get_context().bump()
        nm = compile_native(ntp.get_context().module)
        x = np.arange(1.0, n + 1.0)
        y = np.asarray(nm.function("entry")(x))
        expect = x.copy()
        expect[1:-1] = 3.0 * x[1:-1]
        np.testing.assert_allclose(y, expect, atol=1e-12)
        ntp.reset_context()
