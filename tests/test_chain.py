"""Whole-opdef fused chain kernel (`lowering/pallas_chain`).

VERDICT r2 item #2 residue: composite opdefs (the reference's normal case,
e.g. `ac_A` in `/root/reference/test/smoke_tests/smoke_time_advance.mlir:30-60`)
previously ran stage-at-a-time — one Pallas window pass (= one full HBM round
trip) per apply. The chain kernel walks the WHOLE flattened apply DAG inside
one rolling-window pass, holding intermediates VMEM-resident. These tests run
it in interpret mode against the jnp lowering as oracle, and check the plan's
eligibility gates and the custom_jvp differentiation fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neptune_tpu.config import config
from neptune_tpu.ir import (
    F32,
    Bounds,
    NeptuneBuilder,
    ScalarType,
    TempType,
)
from neptune_tpu.lowering import pallas_chain
from neptune_tpu.lowering.executor import CompiledModule
from neptune_tpu.passes import compile_ir


@pytest.fixture
def interpret():
    config.pallas_interpret = True
    try:
        yield
    finally:
        config.pallas_interpret = False


def _build_lap(b, tt, n, rank, name="lap", dtype="float32"):
    """5-pt (rank 2) / 7-pt (rank 3) interior Laplacian-ish opdef."""
    fn = b.make_opdef(name, "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    shape = tt.bounds.shape
    interior = Bounds.of((1,) * rank, tuple(s - 1 for s in shape))
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    u = body.args[rank]
    st = ScalarType(dtype)
    s = None
    for d in range(rank):
        off_lo = [0] * rank
        off_hi = [0] * rank
        off_lo[d], off_hi[d] = -1, 1
        pair = b.add(b.access(u, off_lo), b.access(u, off_hi))
        s = pair if s is None else b.add(s, pair)
    center = b.mul(b.constant(float(2 * rank), st), b.access(u, [0] * rank))
    b.yield_(b.sub(center, s))
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()
    return fn


def lap_chain_module(n, rank=2, stages=2, dtype="float32"):
    """composite = lap(lap(...lap(x)...)), `stages` deep."""
    b = NeptuneBuilder()
    shape = (n,) * rank if rank == 2 else (32, 16, n)
    bounds = Bounds.of((0,) * rank, shape)
    tt = TempType(dtype, bounds)
    _build_lap(b, tt, n, rank, dtype=dtype)
    wf = b.make_opdef("chain", "linear_opdef", [tt], [tt])
    b.push_block(wf.body)
    y = wf.body.args[0]
    for _ in range(stages):
        y = b.apply_linear("lap", [y])
    b.return_([y])
    b.pop_block()
    return compile_ir(b.module)


def scalar_chain_module(n):
    """chain(x, w) = wjac(wjac(x, w), w): every stage takes the runtime w."""
    b = NeptuneBuilder()
    bounds = Bounds.of((0, 0), (n, n))
    tt = TempType("float32", bounds)
    st = ScalarType("float32")
    fn = b.make_opdef("wjac", "nonlinear_opdef", [tt, st], [tt])
    b.push_block(fn.body)
    interior = Bounds.of((1, 1), (n - 1, n - 1))
    op, body = b.start_apply(
        [fn.body.args[0]], interior, scalar_params=[fn.body.args[1]]
    )
    b.push_block(body)
    u, w = body.args[2], body.args[3]
    quarter = b.constant(0.25, st)
    avg = b.mul(
        quarter,
        b.add(
            b.add(b.access(u, [-1, 0]), b.access(u, [1, 0])),
            b.add(b.access(u, [0, -1]), b.access(u, [0, 1])),
        ),
    )
    b.yield_(
        b.add(b.access(u, [0, 0]), b.mul(w, b.sub(avg, b.access(u, [0, 0]))))
    )
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    wf = b.make_opdef("chain", "nonlinear_opdef", [tt, st], [tt])
    b.push_block(wf.body)
    y1 = b.apply_nonlinear("wjac", [wf.body.args[0], wf.body.args[1]])
    y2 = b.apply_nonlinear("wjac", [y1, wf.body.args[1]])
    b.return_([y2])
    b.pop_block()
    return compile_ir(b.module)


def periodic_chain_module(n, stages=3, mixed=False, use_index=False):
    """composite of torus (periodic, full-domain) 5-pt stages; mixed=True
    swaps the middle stage for a BOUNDED interior op (legal in one chain:
    the wrapped window rows carry true torus values, so every stage's
    per-row semantics is position-exact); use_index adds a coordinate term
    to each periodic stage, pinning the modular dim-0 iotas at wrapped rows.
    """
    b = NeptuneBuilder()
    bounds = Bounds.of((0, 0), (n, n))
    tt = TempType("float32", bounds)
    st = ScalarType("float32")

    fn = b.make_opdef("plap", "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], bounds, periodic=True)
    b.push_block(body)
    u = body.args[2]
    s = b.add(
        b.add(b.access(u, [-1, 0]), b.access(u, [1, 0])),
        b.add(b.access(u, [0, -1]), b.access(u, [0, 1])),
    )
    y = b.add(
        b.mul(b.constant(0.6, st), b.access(u, [0, 0])),
        b.mul(b.constant(0.1, st), s),
    )
    if use_index:
        # + 1e-4 * i0: wrong (non-modular) coordinates at wrapped rows
        # would leak into output rows near the domain edge
        y = b.add(y, b.mul(b.constant(1e-4, st), b.cast(body.args[0], st)))
    b.yield_(y)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    if mixed:
        _build_lap(b, tt, n, 2, name="blap")

    wf = b.make_opdef("chain", "linear_opdef", [tt], [tt])
    b.push_block(wf.body)
    y = wf.body.args[0]
    for i in range(stages):
        callee = "blap" if (mixed and i == stages // 2) else "plap"
        y = b.apply_linear(callee, [y])
    b.return_([y])
    b.pop_block()
    return compile_ir(b.module)


class TestChainPlan:
    def test_eligible_composite(self):
        cm = lap_chain_module(128)
        plan = pallas_chain.chain_plan(cm.module, "chain")
        assert plan is not None
        assert len(plan["stages"]) == 2
        assert plan["hp"] >= 2 and plan["hp"] % 8 == 0
        assert plan["shape"][0] % plan["slab"] == 0

    def test_single_apply_ineligible(self):
        # single applies take the existing one-op window kernels
        cm = lap_chain_module(128, stages=1)
        assert pallas_chain.chain_plan(cm.module, "chain") is None

    def test_f64_ineligible(self):
        cm = lap_chain_module(128, dtype="float64")
        assert pallas_chain.chain_plan(cm.module, "chain") is None

    def test_narrow_grid_ineligible(self):
        # last dim < 128 lanes: not worth a window pass
        cm = lap_chain_module(64)
        assert pallas_chain.chain_plan(cm.module, "chain") is None


class TestPeriodicChain:
    def test_plan_whole_grid_only(self):
        cm = periodic_chain_module(128)
        plan = pallas_chain.chain_plan(cm.module, "chain")
        assert plan is not None and plan["periodic"]
        # a caller-supplied local shape (the shard_map path) must reject
        # periodic chains: torus wrap is defined against the outer bounds
        assert pallas_chain.chain_plan(cm.module, "chain", (128, 128)) is None

    def test_matches_jnp_oracle(self, interpret):
        cm = periodic_chain_module(128, stages=3)
        assert pallas_chain.chain_plan(cm.module, "chain") is not None
        x = np.random.default_rng(11).standard_normal((128, 128)).astype(
            np.float32
        )
        out = np.asarray(cm.opdef("chain")(x))
        ref = np.asarray(CompiledModule(cm.module, "jnp").opdef("chain")(x))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_mixed_periodic_bounded_stages(self, interpret):
        cm = periodic_chain_module(128, stages=3, mixed=True)
        assert pallas_chain.chain_plan(cm.module, "chain") is not None
        x = np.random.default_rng(12).standard_normal((128, 128)).astype(
            np.float32
        )
        out = np.asarray(cm.opdef("chain")(x))
        ref = np.asarray(CompiledModule(cm.module, "jnp").opdef("chain")(x))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_index_coordinates_wrap(self, interpret):
        # coordinate-dependent bodies: the wrapped edge-window rows must
        # evaluate index() at the TRUE torus row, not the out-of-range
        # window coordinate
        cm = periodic_chain_module(128, stages=3, use_index=True)
        assert pallas_chain.chain_plan(cm.module, "chain") is not None
        x = np.random.default_rng(13).standard_normal((128, 128)).astype(
            np.float32
        )
        out = np.asarray(cm.opdef("chain")(x))
        ref = np.asarray(CompiledModule(cm.module, "jnp").opdef("chain")(x))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


class TestChainExecution:
    def test_matches_jnp_oracle_rank2(self, interpret):
        cm = lap_chain_module(128, stages=3)
        assert pallas_chain.chain_plan(cm.module, "chain") is not None
        x = np.random.default_rng(0).standard_normal((128, 128)).astype(
            np.float32
        )
        out = np.asarray(cm.opdef("chain")(x))
        ref = np.asarray(CompiledModule(cm.module, "jnp").opdef("chain")(x))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_matches_jnp_oracle_rank3(self, interpret):
        cm = lap_chain_module(128, rank=3)
        assert pallas_chain.chain_plan(cm.module, "chain") is not None
        x = np.random.default_rng(1).standard_normal((32, 16, 128)).astype(
            np.float32
        )
        out = np.asarray(cm.opdef("chain")(x))
        ref = np.asarray(CompiledModule(cm.module, "jnp").opdef("chain")(x))
        # f32 contraction order differs between the windowed and whole-array
        # lowerings; agreement is to f32 roundoff, not bitwise
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_runtime_scalar_threading(self, interpret):
        cm = scalar_chain_module(128)
        assert pallas_chain.chain_plan(cm.module, "chain") is not None
        oracle = CompiledModule(cm.module, "jnp").opdef("chain")
        x = np.random.default_rng(2).standard_normal((128, 128)).astype(
            np.float32
        )
        run = cm.opdef("chain")
        for w in (0.8, 1.3):  # two values: resolved at runtime, not baked
            out = np.asarray(run(x, np.float32(w)))
            ref = np.asarray(oracle(x, np.float32(w)))
            np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_jvp_falls_back_to_jnp(self, interpret):
        # pallas_call has no JVP rule; the opdef callable's custom_jvp
        # re-derives primal+tangent from the jnp lowering
        cm = lap_chain_module(128)
        f = cm.opdef("chain")
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((128, 128)), jnp.float32
        )
        v = jnp.ones_like(x)
        y, t = jax.jvp(f, (x,), (v,))
        oy, ot = jax.jvp(
            CompiledModule(cm.module, "jnp").opdef("chain"), (x,), (v,)
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(oy), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(ot), atol=1e-5)

    def test_sharded_composite_core_through_chain(self, interpret):
        # the fused-composite sharded route runs its zero-ghost core sweep
        # through the chain kernel (one pass for the whole DAG); band
        # fixups restore cross-shard edges. Oracle: the non-sharded jnp
        # lowering over the full grid.
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from neptune_tpu.parallel import GridMesh, shardmap_opdef
        from neptune_tpu.parallel.sharded_apply import plan_opdef

        n = 256
        cm = lap_chain_module(n)
        gm = GridMesh((2, 2), ("x", "y"))
        assert plan_opdef(cm, "chain", gm).kind == "fused-composite"
        # local blocks are 128x128: the chain plan engages on nloc
        assert (
            pallas_chain.chain_plan(cm.module, "chain", (128, 128))
            is not None
        )
        f = jax.jit(shardmap_opdef(cm, "chain", gm))
        x = np.random.default_rng(5).standard_normal((n, n)).astype(
            np.float32
        )
        out = np.asarray(f(gm.shard(jnp.asarray(x))))
        ref = np.asarray(CompiledModule(cm.module, "jnp").opdef("chain")(x))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_sharded_composite_chain_runtime_scalar(self, interpret):
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        from neptune_tpu.parallel import GridMesh, shardmap_opdef

        n = 256
        cm = scalar_chain_module(n)
        gm = GridMesh((2,), ("x",))
        f = jax.jit(shardmap_opdef(cm, "chain", gm))
        oracle = CompiledModule(cm.module, "jnp").opdef("chain")
        x = np.random.default_rng(6).standard_normal((n, n)).astype(
            np.float32
        )
        xs = gm.shard(jnp.asarray(x))
        for w in (0.8, 1.3):
            out = np.asarray(f(xs, jnp.float32(w)))
            ref = np.asarray(oracle(x, np.float32(w)))
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_grad_through_opdef(self, interpret):
        cm = lap_chain_module(128)
        f = cm.opdef("chain")
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((128, 128)), jnp.float32
        )
        g = jax.grad(lambda u: jnp.sum(f(u) ** 2))(x)
        oracle = CompiledModule(cm.module, "jnp").opdef("chain")
        og = jax.grad(lambda u: jnp.sum(oracle(u) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(og), atol=1e-4)
