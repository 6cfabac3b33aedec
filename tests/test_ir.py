"""IR layer tests: types, op contracts, verifier, structure keys, printer.

Mirrors the reference's verifier test tier (`test/mlir_tests/*.mlir` negative
tests + op verifiers in `lib/Dialect/NeptuneIR/NeptuneIRVerifier.cpp`).
"""

import pytest

from neptune_tpu.ir import (
    F64,
    Bounds,
    FieldType,
    IRError,
    Location,
    NeptuneBuilder,
    StencilShape,
    TempType,
    TensorType,
    print_module,
    verify_and_annotate,
)


def build_lap_1d(b, name="lap", n=16, interior=(1, 15)):
    bounds = Bounds.of([0], [n])
    tt = TempType("float64", bounds)
    fn = b.make_opdef(name, "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], Bounds.of([interior[0]], [interior[1]]))
    b.push_block(body)
    um1 = b.access(body.args[1], [-1])
    u0 = b.access(body.args[1], [0])
    up1 = b.access(body.args[1], [1])
    lap = b.add(b.sub(um1, b.mul(b.constant(2.0, F64), u0)), up1)
    b.yield_(lap)
    b.pop_block()
    res = b.finish_apply(op)
    b.return_([res])
    b.pop_block()
    return fn, tt


class TestBounds:
    def test_shape(self):
        assert Bounds.of([1, 2], [5, 10]).shape == (4, 8)

    def test_contains(self):
        outer = Bounds.of([0, 0], [16, 16])
        assert outer.contains(Bounds.of([1, 1], [15, 15]))
        assert not outer.contains(Bounds.of([-1, 0], [15, 15]))

    def test_rel_slices(self):
        outer = Bounds.of([2], [18])
        inner = Bounds.of([3], [17])
        assert inner.rel_slices(outer) == (slice(1, 15),)

    def test_rank_mismatch_rejected(self):
        with pytest.raises(ValueError):
            Bounds.of([0], [4, 4])


class TestStencilShape:
    def test_halo(self):
        s = StencilShape.of([(-1, 0), (1, 0), (0, -2), (0, 3), (0, 0)])
        assert s.halo() == ((1, 1), (2, 3))

    def test_compose(self):
        a = StencilShape.of([(-1,), (0,), (1,)])
        c = a.compose(a)
        assert set(c.offsets) == {(-2,), (-1,), (0,), (1,), (2,)}


class TestOpContracts:
    def test_wrap_shape_mismatch(self):
        b = NeptuneBuilder()
        fn = b.make_function("f", "func", [TensorType("float64", (8,))], [])
        b.push_block(fn.body)
        with pytest.raises(IRError):
            b.wrap(fn.body.args[0], FieldType("float64", Bounds.of([0], [16])))

    def test_solve_linear_element_mismatch(self):
        # reference negative test: f32 system rejected
        # (test/mlir_tests/solve-linear-invalid-system.mlir)
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [4])
        tt32 = TempType("float32", bounds)
        fn = b.make_opdef("A", "linear_opdef", [tt32], [tt32])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        b.yield_(b.access(body.args[1], [0]))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()

        entry = b.make_function("entry", "func", [TempType("float64", bounds)], [])
        b.push_block(entry.body)
        A = b.assemble_matrix("A")
        with pytest.raises(IRError):
            b.solve_linear(A, entry.body.args[0])
        b.pop_block()

    def test_access_rank_mismatch(self):
        b = NeptuneBuilder()
        tt = TempType("float64", Bounds.of([0, 0], [4, 4]))
        fn = b.make_opdef("op2d", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], tt.bounds)
        b.push_block(body)
        with pytest.raises(IRError):
            b.access(body.args[2], [1])  # rank-2 temp, rank-1 offset
        b.pop_block()
        b.pop_block()

    def test_apply_bounds_outside_domain(self):
        b = NeptuneBuilder()
        tt = TempType("float64", Bounds.of([0], [4]))
        fn = b.make_opdef("op", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        with pytest.raises(IRError):
            b.start_apply([fn.body.args[0]], Bounds.of([0], [8]))
        b.pop_block()

    def test_reduce_accepts_field_directly(self):
        # reference `neptune_ir.reduce` takes a FIELD (NeptuneIROps.td:272-299);
        # the builder inserts the implicit load (VERDICT r2 parity nit #5)
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [8])
        ft = FieldType("float64", bounds)
        entry = b.make_function("entry", "func", [ft], [])
        b.push_block(entry.body)
        r = b.reduce(entry.body.args[0], "sum")
        assert str(r.type) == "f64"
        ops = [op.name for op in entry.body.ops]
        assert ops == ["neptune.load", "neptune.reduce"]
        b.return_([])
        b.pop_block()

    def test_unresolved_symbol(self):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [4])
        entry = b.make_function("entry", "func", [], [])
        b.push_block(entry.body)
        with pytest.raises(KeyError):
            b.assemble_matrix("missing")
        b.pop_block()


class TestVerifier:
    def test_structure_key_and_halo(self):
        b = NeptuneBuilder()
        fn, _ = build_lap_1d(b)
        verify_and_annotate(b.module)
        assert "structure_key" in fn.attrs
        assert fn.attrs["halo"] == ((1, 1),)
        assert isinstance(fn.attrs["structure_key_hash"], int)

    def test_structure_key_deterministic(self):
        keys = []
        for _ in range(2):
            b = NeptuneBuilder()
            fn, _ = build_lap_1d(b)
            verify_and_annotate(b.module)
            keys.append(fn.attrs["structure_key_hash"])
        assert keys[0] == keys[1]

    def test_composed_halo(self):
        # A(x) = x - alpha * lap(lap(x)) should have halo 2
        b = NeptuneBuilder()
        lap_fn, tt = build_lap_1d(b, "lap", n=16, interior=(2, 14))
        fn = b.make_opdef("biharm", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        l1 = b.apply_linear("lap", [fn.body.args[0]])
        l2 = b.apply_linear("lap", [l1])
        b.return_([l2])
        b.pop_block()
        verify_and_annotate(b.module)
        assert fn.attrs["halo"] == ((2, 2),)

    def test_linearity_whitelist_rejects_u_squared(self):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [8])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("sq", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        u0 = b.access(body.args[1], [0])
        b.yield_(b.mul(u0, u0))  # u*u is nonlinear
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        with pytest.raises(IRError, match="linearity|mul"):
            verify_and_annotate(b.module)

    def test_linearity_whitelist_rejects_div_by_field(self):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [8])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("dv", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        u0 = b.access(body.args[1], [0])
        one = b.constant(1.0, F64)
        b.yield_(b.div(one, u0))  # 1/u is nonlinear
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        with pytest.raises(IRError, match="div"):
            verify_and_annotate(b.module)

    def test_variable_coefficient_linear_allowed(self):
        # index-derived coefficients are u-independent: sigma^2 S_i^2 v_xx
        # is linear in v (extension over the reference's constant-only
        # whitelist; see ir.verify._verify_linear_body)
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [8])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("varco", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        from neptune_tpu.ir import F64

        s = b.cast(body.args[0], F64)  # coefficient from the index IV
        coeff = b.mul(s, s)  # coeff * coeff stays coefficient
        u0 = b.access(body.args[1], [0])
        b.yield_(b.mul(coeff, u0))  # coeff * linear is linear
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        verify_and_annotate(b.module)  # must not raise

    def test_select_with_linear_condition_rejected(self):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [8])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("selbad", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        from neptune_tpu.ir import F64

        u0 = b.access(body.args[1], [0])
        cond = b.cmp("gt", u0, b.constant(0.0, F64))  # u-dependent condition
        b.yield_(b.select(cond, u0, b.neg(u0)))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        with pytest.raises(IRError, match="cmp|select|coefficients"):
            verify_and_annotate(b.module)

    def test_nonlinear_opdef_allows_math(self):
        b = NeptuneBuilder()
        bounds = Bounds.of([0], [8])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("nl", "nonlinear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], bounds)
        b.push_block(body)
        u0 = b.access(body.args[1], [0])
        b.yield_(b.unary_math("tanh", b.mul(u0, u0)))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        verify_and_annotate(b.module)  # must not raise


class TestPrinter:
    def test_dump_roundtrip_stability(self):
        b = NeptuneBuilder()
        build_lap_1d(b)
        verify_and_annotate(b.module)
        d1 = print_module(b.module)
        d2 = print_module(b.module)
        assert d1 == d2
        assert "neptune.linear_opdef @lap" in d1
        assert "neptune.access" in d1
        assert "[1,15)" in d1

    def test_clone_preserves_dump(self):
        b = NeptuneBuilder()
        build_lap_1d(b)
        verify_and_annotate(b.module)
        assert print_module(b.module.clone()) == print_module(b.module)


class TestReviewRound3Regressions:
    def _lap_opdef(self, b, name, n=16, periodic=False):
        from neptune_tpu.ir import Bounds, F64, TempType

        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        fn = b.make_opdef(name, "nonlinear_opdef", [tt], [tt])
        b.push_block(fn.body)
        interior = bounds if periodic else Bounds.of([1], [n - 1])
        op, body = b.start_apply(
            [fn.body.args[0]], interior, periodic=periodic
        )
        b.push_block(body)
        u0 = b.access(body.args[1], [0])
        um = b.access(body.args[1], [-1])
        up = b.access(body.args[1], [1])
        two = b.constant(2.0, F64)
        b.yield_(b.sub(b.mul(two, u0), b.add(um, up)))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()
        return fn

    def test_structure_key_distinguishes_periodic(self):
        # review: a torus operator and its bounded twin hashed to the same
        # structure key, so the shared callable cache served the wrong
        # lowering to one of them
        from neptune_tpu.ir import NeptuneBuilder
        from neptune_tpu.ir.verify import _structure_key

        b = NeptuneBuilder()
        f1 = self._lap_opdef(b, "bounded", periodic=False)
        b2 = NeptuneBuilder()
        f2 = self._lap_opdef(b2, "torus", periodic=True)
        # make the bounded twin's bounds identical to the periodic one's
        b3 = NeptuneBuilder()
        from neptune_tpu.ir import Bounds, F64, TempType

        n = 16
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        fn = b3.make_opdef("full", "nonlinear_opdef", [tt], [tt])
        b3.push_block(fn.body)
        op, body = b3.start_apply([fn.body.args[0]], bounds, periodic=False)
        b3.push_block(body)
        u0 = b3.access(body.args[1], [0])
        um = b3.access(body.args[1], [-1])
        up = b3.access(body.args[1], [1])
        two = b3.constant(2.0, F64)
        b3.yield_(b3.sub(b3.mul(two, u0), b3.add(um, up)))
        b3.pop_block()
        b3.return_([b3.finish_apply(op)])
        b3.pop_block()
        assert _structure_key(f2) != _structure_key(fn)

    def test_multi_result_apply_reach_on_all_results(self):
        # review: only results[0] carried the stencil reach; dataflow
        # through results[1:] annotated an EMPTY halo -> zero-width
        # exchanges on sharded runs
        from neptune_tpu.ir import Bounds, F64, NeptuneBuilder, TempType
        from neptune_tpu.ir.verify import verify_and_annotate

        b = NeptuneBuilder()
        n = 16
        bounds = Bounds.of([0], [n])
        tt = TempType("float64", bounds)
        fn = b.make_opdef("second", "nonlinear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply(
            [fn.body.args[0]], Bounds.of([2], [n - 2]),
            result_types=[tt, tt],
        )
        b.push_block(body)
        um = b.access(body.args[1], [-2])
        up = b.access(body.args[1], [1])
        b.yield_([b.add(um, up), b.sub(um, up)])
        b.pop_block()
        outs = b.finish_apply(op)
        # return ONLY the second result
        b.return_([outs[1]])
        b.pop_block()
        verify_and_annotate(b.module)
        halo = b.module.lookup("second").attrs.get("halo")
        assert halo and tuple(halo[0]) == (2, 1), halo

    def test_parser_truncations_raise_parseerror(self):
        # review: truncated stage dumps crashed with TypeError/KeyError
        # instead of the lexer's line-diagnostic ParseError
        from neptune_tpu.ir import NeptuneBuilder
        from neptune_tpu.ir.parser import ParseError, parse_module
        from neptune_tpu.ir.printer import print_module

        b = NeptuneBuilder()
        self._lap_opdef(b, "lap")
        txt = print_module(b.module)
        for cut in range(1, len(txt), 7):
            with pytest.raises(ParseError):
                parse_module(txt[:cut])
        # the full text still round-trips
        assert parse_module(txt) is not None
