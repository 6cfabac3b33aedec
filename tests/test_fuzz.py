"""Differential fuzzing: random stencil opdefs executed on the jnp executor,
the native C++ runtime, and (for eligible shapes) the Pallas interpreter, with
all backends required to agree to 1e-9 on float64 / 1e-4 on float32.

This is the systematic version of the review that caught the multi-slab halo
and lb-alignment divergences: random offsets, bounds, ranks, arithmetic DAGs,
selects on index predicates, and multi-input kernels.
"""

import shutil

import numpy as np
import pytest

from neptune_tpu.config import config
from neptune_tpu.ir import (
    BOOL,
    Bounds,
    F64,
    NeptuneBuilder,
    ScalarType,
    TempType,
)
from neptune_tpu.passes import compile_ir

HAVE_GXX = shutil.which("g++") is not None


def random_opdef(rng: np.random.Generator, case: int):
    """Build a random nonlinear opdef; returns (module, name, shape)."""
    rank = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(8, 20)) for _ in range(rank))
    lb = tuple(int(rng.integers(0, 3)) for _ in range(rank))
    bounds = Bounds.of(lb, tuple(l + s for l, s in zip(lb, shape)))
    n_in = int(rng.integers(1, 3))
    tt = TempType("float64", bounds)

    # random offsets with |o| <= 2, plus the center
    n_off = int(rng.integers(1, 5))
    offsets = [tuple(int(rng.integers(-2, 3)) for _ in range(rank)) for _ in range(n_off)]
    offsets.append((0,) * rank)
    halo = [max(abs(o[d]) for o in offsets) for d in range(rank)]
    interior = Bounds.of(
        tuple(l + h for l, h in zip(bounds.lb, halo)),
        tuple(u - h for u, h in zip(bounds.ub, halo)),
    )

    b = NeptuneBuilder()
    name = f"fuzz_{case}"
    fn = b.make_opdef(name, "nonlinear_opdef", [tt] * n_in, [tt])
    b.push_block(fn.body)
    op, body = b.start_apply(list(fn.body.args), interior)
    b.push_block(body)

    # leaf pool: accesses + constants + index casts
    pool = []
    for off in offsets:
        k = int(rng.integers(0, n_in))
        pool.append(b.access(body.args[rank + k], off))
    for _ in range(2):
        pool.append(b.constant(float(rng.uniform(-2, 2)), F64))
    pool.append(b.cast(body.args[int(rng.integers(0, rank))], F64))

    # random DAG of whitelisted scalar ops
    for _ in range(int(rng.integers(2, 8))):
        kind = rng.choice(["add", "sub", "mul", "div", "min", "max", "sel", "tanh"])
        a = pool[int(rng.integers(0, len(pool)))]
        c = pool[int(rng.integers(0, len(pool)))]
        if kind == "add":
            v = b.add(a, c)
        elif kind == "sub":
            v = b.sub(a, c)
        elif kind == "mul":
            # bound magnitudes to keep f64 vs f32-free comparison meaningful
            v = b.mul(b.unary_math("tanh", a), b.unary_math("tanh", c))
        elif kind == "div":
            v = b.div(a, b.constant(float(rng.uniform(1.0, 3.0)), F64))
        elif kind == "min":
            v = b.minimum(a, c)
        elif kind == "max":
            v = b.maximum(a, c)
        elif kind == "sel":
            iv = body.args[int(rng.integers(0, rank))]
            cond = b.cmp(
                "lt", iv, b.constant(int(rng.integers(1, 12)), iv.type)
            )
            v = b.select(cond, a, c)
        else:
            v = b.unary_math("tanh", a)
        pool.append(v)

    b.yield_(pool[-1])
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()
    return b.module, name, shape, n_in


@pytest.mark.parametrize("case", range(25))
def test_jnp_vs_native_random_programs(case):
    if not HAVE_GXX:
        pytest.skip("needs g++")
    rng = np.random.default_rng(1000 + case)
    module, name, shape, n_in = random_opdef(rng, case)
    inputs = [rng.standard_normal(shape) for _ in range(n_in)]

    cm = compile_ir(module, backend="jnp")
    y_jnp = np.asarray(cm.opdef(name)(*inputs))

    # native path: wrap the opdef in an exported function
    from neptune_tpu.ir import NeptuneBuilder as NB

    b = NB(module)
    fn = module.lookup(name)
    entry = b.make_function("main", "func", list(fn.ftype.inputs), list(fn.ftype.results))
    b.push_block(entry.body)
    out = b.apply_nonlinear(name, list(entry.body.args))
    b.return_([out])
    b.pop_block()

    from neptune_tpu.runtime import compile_native

    nm = compile_native(module)
    y_nat = np.asarray(nm.function("main")(*inputs))
    np.testing.assert_allclose(
        y_jnp, y_nat, atol=1e-9, err_msg=f"case {case}: jnp vs native diverged"
    )


@pytest.mark.parametrize("case", range(8))
def test_jnp_vs_pallas_random_programs(case):
    """Pallas-eligible random programs (f32, rank 2, >= 64x128)."""
    rng = np.random.default_rng(2000 + case)
    n0 = int(rng.integers(64, 90))
    n1 = 128
    bounds = Bounds.of((0, 0), (n0, n1))
    tt = TempType("float32", bounds)
    offsets = [
        (int(rng.integers(-2, 3)), int(rng.integers(-2, 3))) for _ in range(3)
    ] + [(0, 0)]
    h = [max(abs(o[d]) for o in offsets) for d in (0, 1)]
    interior = Bounds.of((h[0], h[1]), (n0 - h[0], n1 - h[1]))

    b = NeptuneBuilder()
    fn = b.make_opdef("f", "nonlinear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    from neptune_tpu.ir import F32

    acc = None
    for off in offsets:
        t = b.access(body.args[2], off)
        t = b.mul(t, b.constant(float(rng.uniform(-1, 1)), F32))
        acc = t if acc is None else b.add(acc, t)
    b.yield_(acc)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    x = rng.standard_normal((n0, n1)).astype(np.float32)
    y_jnp = np.asarray(compile_ir(b.module, backend="jnp").opdef("f")(x))

    config.pallas_interpret = True
    try:
        y_pal = np.asarray(compile_ir(b.module, backend="pallas").opdef("f")(x))
    finally:
        config.pallas_interpret = False
    np.testing.assert_allclose(
        y_jnp, y_pal, atol=1e-5, err_msg=f"case {case}: jnp vs pallas diverged"
    )


@pytest.mark.parametrize("case", range(6))
def test_periodic_jnp_vs_native(case):
    """Periodic random programs: wrap semantics must agree across backends."""
    if not HAVE_GXX:
        pytest.skip("needs g++")
    rng = np.random.default_rng(3000 + case)
    rank = int(rng.integers(1, 3))
    shape = tuple(int(rng.integers(8, 16)) for _ in range(rank))
    bounds = Bounds.of((0,) * rank, shape)
    tt = TempType("float64", bounds)
    offsets = [
        tuple(int(rng.integers(-2, 3)) for _ in range(rank)) for _ in range(3)
    ]

    b = NeptuneBuilder()
    fn = b.make_opdef("p", "nonlinear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], bounds, periodic=True)
    b.push_block(body)
    acc = None
    for off in offsets:
        t = b.mul(
            b.access(body.args[rank], off),
            b.constant(float(rng.uniform(-1, 1)), F64),
        )
        acc = t if acc is None else b.add(acc, t)
    b.yield_(acc)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    entry = b.make_function("main", "func", [tt], [tt])
    b.push_block(entry.body)
    out = b.apply_nonlinear("p", [entry.body.args[0]])
    b.return_([out])
    b.pop_block()

    x = rng.standard_normal(shape)
    y_jnp = np.asarray(compile_ir(b.module, backend="jnp").opdef("p")(x))

    from neptune_tpu.runtime import compile_native

    y_nat = np.asarray(compile_native(b.module).function("main")(x))
    np.testing.assert_allclose(
        y_jnp, y_nat, atol=1e-10, err_msg=f"periodic case {case} diverged"
    )


@pytest.mark.parametrize("case", range(8))
def test_multisweep_vs_loop_random_programs(case):
    """Random eligible operators: K fused sweeps must equal K single applies."""
    from neptune_tpu.lowering import pallas_multisweep

    rng = np.random.default_rng(4000 + case)
    n0 = int(rng.choice([64, 96, 128]))
    n1 = int(rng.choice([128, 256]))
    k = int(rng.integers(2, 9))
    bounds = Bounds.of((0, 0), (n0, n1))
    from neptune_tpu.ir import F32

    tt = TempType("float32", bounds)
    n_off = int(rng.integers(2, 5))
    offsets = [
        (int(rng.integers(-2, 3)), int(rng.integers(-2, 3)))
        for _ in range(n_off)
    ] + [(0, 0)]
    h = [max(abs(o[d]) for o in offsets) for d in (0, 1)]
    if h[0] == 0:
        offsets.append((1, 0))
        h[0] = 1
    interior = Bounds.of((h[0], h[1]), (n0 - h[0], n1 - h[1]))

    b = NeptuneBuilder()
    fn = b.make_opdef("ms", "nonlinear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    acc = None
    for off in offsets:
        # tanh-bounded terms keep K-fold f32 accumulation comparable
        t = b.mul(
            b.unary_math("tanh", b.access(body.args[2], off)),
            b.constant(float(rng.uniform(-0.3, 0.3)), F32),
        )
        acc = t if acc is None else b.add(acc, t)
    b.yield_(acc)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    cm = compile_ir(b.module, backend="auto")
    x = rng.standard_normal((n0, n1)).astype(np.float32)
    one = cm.opdef("ms")
    y_ref = x
    for _ in range(k):
        y_ref = np.asarray(one(y_ref), np.float32)

    if pallas_multisweep.best_depth(cm.module, "ms", k) is None:
        pytest.skip(f"case {case}: geometry ineligible (k={k}, h={h})")
    config.pallas_interpret = True
    try:
        y = np.asarray(cm.sweeps("ms", k)(x))
    finally:
        config.pallas_interpret = False
    np.testing.assert_allclose(
        y, y_ref, atol=1e-5,
        err_msg=f"case {case}: fused k={k} sweeps diverged (h={h})",
    )


@pytest.mark.parametrize("case", range(8))
def test_two_level_window_random_programs(case):
    """Random operators forced through the two-level (slab x panel) window
    by shrunken VMEM budgets: must equal K single applies, across random
    stencil reaches, grid shapes, and fused depths."""
    from neptune_tpu.lowering import pallas_multisweep

    rng = np.random.default_rng(5000 + case)
    n0 = int(rng.choice([128, 256]))
    n1 = int(rng.choice([1024, 1536, 2048]))
    k = int(rng.integers(4, 10))
    bounds = Bounds.of((0, 0), (n0, n1))
    from neptune_tpu.ir import F32

    tt = TempType("float32", bounds)
    n_off = int(rng.integers(2, 5))
    offsets = [
        (int(rng.integers(-2, 3)), int(rng.integers(-2, 3)))
        for _ in range(n_off)
    ] + [(0, 0), (1, 0)]
    h = [max(abs(o[d]) for o in offsets) for d in (0, 1)]
    interior = Bounds.of((h[0], h[1]), (n0 - h[0], n1 - h[1]))

    b = NeptuneBuilder()
    fn = b.make_opdef("tl", "nonlinear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    acc = None
    for off in offsets:
        t = b.mul(
            b.unary_math("tanh", b.access(body.args[2], off)),
            b.constant(float(rng.uniform(-0.3, 0.3)), F32),
        )
        acc = t if acc is None else b.add(acc, t)
    b.yield_(acc)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    cm = compile_ir(b.module, backend="auto")
    d0, w0 = pallas_multisweep._VMEM_BUDGET, pallas_multisweep._VMEM_BUDGET_WIDE
    budget = int(rng.choice([900, 1400, 1900])) * 1024
    pallas_multisweep._VMEM_BUDGET = budget
    pallas_multisweep._VMEM_BUDGET_WIDE = budget
    try:
        plan = pallas_multisweep.sweeps_plan(cm.module, "tl", k)
        if plan is None or not plan.get("two_level"):
            pytest.skip(
                f"case {case}: no two-level geometry (k={k}, h={h}, "
                f"n=({n0},{n1}), budget={budget})"
            )
        x = rng.standard_normal((n0, n1)).astype(np.float32)
        one = cm.opdef("tl")
        y_ref = x
        for _ in range(k):
            y_ref = np.asarray(one(y_ref), np.float32)
        config.pallas_interpret = True
        try:
            y = np.asarray(
                pallas_multisweep.execute_sweeps(
                    cm.module, "tl", x, [], k, interpret=True
                )
            )
        finally:
            config.pallas_interpret = False
    finally:
        pallas_multisweep._VMEM_BUDGET = d0
        pallas_multisweep._VMEM_BUDGET_WIDE = w0
    np.testing.assert_allclose(
        y, y_ref, atol=1e-5,
        err_msg=(
            f"case {case}: two-level k={k} sweeps diverged "
            f"(h={h}, plan={ {kk: vv for kk, vv in plan.items() if kk != 'op'} })"
        ),
    )
