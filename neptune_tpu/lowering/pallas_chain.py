"""Heterogeneous-chain Pallas window kernel: a composite opdef's whole apply
DAG fused into ONE rolling-window HBM pass.

Composite operators — the reference's normal case, e.g. `ac_A` =
apply_linear chain + combination apply
(`/root/reference/test/smoke_tests/smoke_time_advance.mlir:30-60`) — were
previously executed stage-at-a-time: each apply (or apply_linear callee)
ran as its own Pallas window kernel, so an S-stage chain paid S full HBM
round trips (e.g. u + c*lap(lap(u)) = 3 applies = 3 passes, capping the
chain at ~1/3 of the single-sweep roofline at HBM-resident sizes).

This kernel is the heterogeneous generalization of the K-sweep
temporal-blocking window (`pallas_multisweep._sweeps_window_impl`): instead
of K repeats of ONE op it walks the opdef's flattened apply DAG once per
window, holding every live intermediate VMEM-resident:

    HBM traffic:  n_fields*(slab + 2*hp) read + slab written  per CHAIN
    vs.           sum over stages of (reads + write) * N      per-stage

Mechanics (shared with the K-sweep window, validated on v5e):
  * the grid walks dim-0 slabs; each step DMAs a `win = slab + 2*hp` row
    window of EVERY field argument into double-buffered VMEM scratch
    (hp = composed dim-0 reach of the whole DAG, padded to the 8-row
    sublane tile), overlapping the next fetch with this window's chain;
  * the ring head-copy fetch (`pallas_backend._ring_window_io`) keeps
    window row r = global row `i*slab - hp + r` on every step with no
    clamp or realignment (round 3 repaired a clamped window with one
    dynamic whole-window `pltpu.roll` per field per step);
  * each stage evaluates its apply's scalar DAG over the full window via
    vector rolls and applies its own copy-through bounds mask
    (global-coordinate iotas, seed = the stage's first input) — exactly
    `_eval_apply_local`'s per-stage semantics, so the chain is
    bit-faithful to the per-stage execution it replaces;
  * validity creep: a dim-0 roll wraps at the window edge, so a stage
    with dim-0 halo h shrinks its inputs' trustworthy band by h on each
    side. The planner tracks per-value creep through the DAG and sizes
    hp >= creep(final), so the extracted center [hp, hp+slab) is exact.
    Trailing dims stay whole in VMEM: wrap garbage only lands at cells
    whose reads leave the domain, which the apply contract leaves
    unspecified and every stage masks back to its seed.

Scope: opdefs with >= 2 applies after inlining apply_linear /
apply_nonlinear calls, field args all sharing the result bounds, trailing
scalar args, float32 (rolls are 32-bit), rank 2 or 3, single-result
applies, one opdef result. Periodic (torus) stages are supported on the
WHOLE-GRID entry point (round 4): the ring fetch's wrapped edge DMAs give
the first/last windows true torus rows and the dim-0 coordinate iotas go
modular, so stage masks and index() bodies evaluate at the wrapped global
row — mixed periodic/bounded chains stay bit-faithful. The sharded
(global_start) path keeps rejecting periodic: its torus wrap rides the
exchanged strips instead. Everything else falls back to per-stage paths.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ir.core import Function, Module, Operation
from ..ir.types import Bounds, ScalarType, StencilShape, TempType
from . import jnp_backend, pallas_backend

# working-set budgets, mirroring pallas_multisweep: default, the rank-2
# escalation for wide rows, and the rank-3 plane-row budget
_VMEM_BUDGET = 9 * 1024 * 1024
_VMEM_BUDGET_WIDE = 28 * 1024 * 1024
_VMEM_BUDGET_3D = 48 * 1024 * 1024

# compile-time guard on the padded window halo (unrolled roll chains)
_MAX_HP = 48


class ChainStage(NamedTuple):
    """One apply of the flattened DAG, operands resolved to env slots."""

    op: Operation
    in_slots: tuple  # env slot per field input, in operand order
    # per scalar operand: ("arg", trailing-arg index) | ("const", value, dtype)
    scalars: tuple
    out_slot: int


def _flatten(
    module: Module,
    fn: Function,
    arg_binds: list,
    next_slot: list,
) -> Optional[tuple]:
    """Flatten an opdef body into ChainStages over env slots.

    arg_binds: one bind per body arg — an int env slot for temps, or a
    ("arg"/"const", ...) tuple for scalars. Returns (stages, final_binds)
    or None if the body contains anything the chain cannot express.
    """
    env: dict[int, object] = {
        a.uid: b for a, b in zip(fn.body.args, arg_binds)
    }
    stages: list[ChainStage] = []
    final = None
    for op in fn.body.ops:
        if op.name == "neptune.apply":
            if len(op.results) != 1:
                return None
            n_in = op.attrs.get("num_inputs", len(op.operands))
            in_slots, scals = [], []
            for o in op.operands[:n_in]:
                b = env.get(o.uid)
                if not isinstance(b, int):
                    return None
                in_slots.append(b)
            for o in op.operands[n_in:]:
                b = env.get(o.uid)
                if not isinstance(b, tuple):
                    return None
                scals.append(b)
            slot = next_slot[0]
            next_slot[0] += 1
            stages.append(
                ChainStage(op, tuple(in_slots), tuple(scals), slot)
            )
            env[op.results[0].uid] = slot
        elif op.name in ("neptune.apply_linear", "neptune.apply_nonlinear"):
            callee = module.lookup(op.attrs["symbol"])
            binds = [env.get(o.uid) for o in op.operands]
            if any(b is None for b in binds):
                return None
            sub = _flatten(module, callee, binds, next_slot)
            if sub is None:
                return None
            sub_stages, sub_final = sub
            stages.extend(sub_stages)
            if len(op.results) != len(sub_final):
                return None
            for r, b in zip(op.results, sub_final):
                env[r.uid] = b
        elif op.name == "arith.constant":
            env[op.results[0].uid] = (
                "const",
                op.attrs["value"],
                op.results[0].type,
            )
        elif op.name == "neptune.return":
            final = [env.get(o.uid) for o in op.operands]
            if any(f is None for f in final):
                return None
        else:
            return None
    if final is None:
        return None
    return stages, final


def _pick_slab_chain(
    extent0: int, row_bytes: int, hp: int, n_windows: int, budget: int
) -> Optional[int]:
    """Largest 8-aligned divisor of extent0 whose working set fits:
    2*n_fields scratch windows + n_windows live values + 2 out blocks."""
    if extent0 % 8:
        return None
    denom = n_windows + 4
    s = (budget // max(row_bytes, 1) - 2 * hp * (n_windows + 2)) // denom
    s = min((s // 8) * 8, extent0 - 2 * hp)
    for cand in range(s, 7, -8):
        if extent0 % cand == 0:
            return cand
    return None


def chain_plan(
    module: Module, name: str, shape: Optional[tuple] = None
) -> Optional[dict]:
    """Plan a one-pass fused window execution of composite opdef @name over
    a grid of `shape` (defaults to the opdef's declared bounds), or None.
    """
    fn = module.lookup(name)
    if not getattr(fn, "is_opdef", False):
        return None
    if len(fn.ftype.results) != 1 or not fn.ftype.inputs:
        return None
    out_t = fn.ftype.results[0]
    if not isinstance(out_t, TempType) or out_t.element != "float32":
        return None
    outer: Bounds = out_t.bounds
    rank = outer.rank
    if rank not in (2, 3):
        return None
    # periodic chains are whole-grid only: torus wrap is defined against the
    # declared outer bounds, so a caller-supplied local shape (the shard_map
    # case, where the exchanged strips provide the wrap) must stay on the
    # per-stage paths
    whole_grid = shape is None
    if shape is None:
        shape = tuple(outer.shape)
    if len(shape) != rank:
        return None
    if shape[-1] % 128:
        # manual HBM window slices need a 128-tile-aligned lane extent on
        # hardware (Mosaic memref_slice restriction); per-stage fallback
        return None

    # leading field args (result-bounds-shaped f32) + trailing scalars
    n_fields = 0
    seen_scalar = False
    for t in fn.ftype.inputs:
        if isinstance(t, TempType):
            if seen_scalar:  # fields must all precede the scalars
                return None
            if t.element != "float32" or t.bounds != outer:
                return None
            n_fields += 1
        elif isinstance(t, ScalarType):
            seen_scalar = True
        else:
            return None
    if n_fields == 0:
        return None
    n_scalars = len(fn.ftype.inputs) - n_fields
    scalar_dtypes = tuple(
        jnp_backend._scalar_dtype(t) for t in fn.ftype.inputs[n_fields:]
    )

    binds: list = list(range(n_fields)) + [
        ("arg", i) for i in range(n_scalars)
    ]
    next_slot = [n_fields]
    flat = _flatten(module, fn, binds, next_slot)
    if flat is None:
        return None
    stages, final = flat
    if len(stages) < 2:  # single applies take the existing window kernels
        return None
    if len(final) != 1 or not isinstance(final[0], int):
        return None
    final_slot = final[0]

    # per-stage checks + dim-0 validity creep through the DAG
    creep = {s: 0 for s in range(n_fields)}
    halos = [0] * rank
    any_periodic = False
    for st in stages:
        op = st.op
        ot: TempType = op.results[0].type
        if ot.element != "float32" or ot.bounds != outer:
            return None
        if op.attrs.get("periodic"):
            # torus stages need true wrapped rows at the array-edge windows
            # (the ring fetch's periodic edge DMAs) and modular coordinates;
            # both are whole-grid-only constructions
            if not whole_grid:
                return None
            any_periodic = True
        n_in = op.attrs.get("num_inputs", len(op.operands))
        if n_in != len(st.in_slots) or n_in < 1:
            return None
        for v in op.operands[:n_in]:
            if v.type.bounds != outer:
                return None
        sshape: StencilShape = op.attrs.get("shape") or StencilShape(())
        halo = (
            sshape.halo()
            if sshape.offsets
            else tuple((0, 0) for _ in range(rank))
        )
        for d in range(rank):
            halos[d] = max(halos[d], max(halo[d]))
        h0 = max(halo[0])
        creep[st.out_slot] = (
            max(creep[s] for s in st.in_slots) + h0
        )
    total0 = creep[final_slot]
    if total0 < 1:
        return None  # no dim-0 stencil anywhere: nothing to window
    if any(h >= s for h, s in zip(halos, shape)):
        return None
    if shape[-1] < 128 or math.prod(shape) < 64 * 128:
        return None

    hp = ((total0 + 7) // 8) * 8
    if hp > _MAX_HP:
        return None

    # peak simultaneously-live window values (for the VMEM budget)
    last_use = {final_slot: len(stages)}
    for idx, st in enumerate(stages):
        for s in st.in_slots:
            last_use[s] = max(last_use.get(s, -1), idx)
    live = set(range(n_fields))
    peak = len(live)
    for idx, st in enumerate(stages):
        live.add(st.out_slot)
        peak = max(peak, len(live))
        live = {s for s in live if last_use.get(s, -1) > idx}

    itemsize = 4
    row_bytes = math.prod(shape[1:]) * itemsize
    budgets = (
        (_VMEM_BUDGET, _VMEM_BUDGET_WIDE) if rank == 2 else (_VMEM_BUDGET_3D,)
    )
    slab = None
    for budget in budgets:
        cand = _pick_slab_chain(
            shape[0], row_bytes, hp, 2 * n_fields + peak, budget
        )
        if cand is not None and cand >= max(hp, 8) and (
            slab is None or cand > slab
        ):
            slab = cand
        # keep escalating while the halo re-fetch overhead (2*hp extra rows
        # per slab, per field) stays above ~12.5% of the slab
        if slab is not None and slab >= 16 * hp:
            break
    if slab is None:
        return None
    win = slab + 2 * hp
    # interior slabs must never hit the window clamp (edge repair assumes
    # only the first/last slab shift), which needs slab >= hp
    if win > shape[0] or slab < hp:
        return None
    return {
        "stages": stages,
        "final_slot": final_slot,
        "n_fields": n_fields,
        "n_scalars": n_scalars,
        "outer": outer,
        "rank": rank,
        "shape": tuple(shape),
        "slab": slab,
        "hp": hp,
        "win": win,
        "last_use": last_use,
        "scalar_dtypes": scalar_dtypes,
        "peak": peak,
        "periodic": any_periodic,
    }


def execute_chain(
    plan: dict,
    fields: Sequence,
    scalars: Sequence,
    *,
    global_start=None,
    interpret: bool = False,
):
    """Run the planned chain in one pallas_call.

    global_start=None: static coordinate bases (whole-grid). Otherwise a
    sequence of traced int32 global coordinates of row 0 per dim, fed via
    SMEM (the shard_map case)."""
    stages = plan["stages"]
    slab, hp, win = plan["slab"], plan["hp"], plan["win"]
    shape = plan["shape"]
    rank = plan["rank"]
    outer: Bounds = plan["outer"]
    n_f = plan["n_fields"]
    last_use = plan["last_use"]
    final_slot = plan["final_slot"]
    dtype = jnp.dtype("float32")
    wshape = (win,) + shape[1:]
    n_slabs = shape[0] // slab
    n_scalars = plan["n_scalars"]
    n_start = 0 if global_start is None else rank
    periodic = bool(plan.get("periodic"))
    assert not (periodic and global_start is not None), (
        "periodic chains are whole-grid only (chain_plan enforces this)"
    )
    assert len(fields) == n_f and len(scalars) == n_scalars

    def kernel(*refs):
        hbm_refs = refs[:n_f]
        start_refs = refs[n_f : n_f + n_start]
        scalar_refs = refs[n_f + n_start : n_f + n_start + n_scalars]
        out_ref = refs[n_f + n_start + n_scalars]
        scratches = refs[n_f + n_start + n_scalars + 1 : -1]
        sems = refs[-1]  # DMA semaphores, shape (n_f, 2, 3)

        i = pl.program_id(0)

        # Ring head-copy fetch (shared with the single-sweep DMA kernels):
        # window row r holds global row i*slab - hp + r on EVERY step with
        # no clamp and no realignment — the round-3 chain paid one dynamic
        # whole-window pltpu.roll per field per step to repair the edge
        # clamp (rotate-by-0 included), plus a 2*hp/slab HBM halo re-read.
        # Stale rows at the array edges are out-of-domain garbage that
        # every stage's copy-through mask discards (same contract).
        pallas_backend._ring_window_io(
            i, hbm_refs, scratches, sems,
            n_in=n_f, slab=slab, h0p=hp, win=win, n_slabs=n_slabs,
            N=shape[0], al=8, periodic=periodic,
        )

        env = {}
        for k in range(n_f):
            env[k] = scratches[k][i % 2]

        def base_of(d):
            if global_start is None:
                return jnp.int32(outer.lb[d])
            return start_refs[d][0, 0]

        def global_iota(d):
            iv = jax.lax.broadcasted_iota(jnp.int32, wshape, d)
            if d == 0:
                off = iv + i * slab - jnp.int32(hp)
                if periodic:
                    # wrapped edge rows hold TRUE torus rows (the ring
                    # fetch's periodic DMAs), so their coordinates — used
                    # by stage masks and index() bodies — must be the
                    # wrapped global row, not the out-of-range window row
                    off = off % jnp.int32(shape[0])
                return off + base_of(0)
            return iv + base_of(d)

        arg_vals = [r[0, 0] for r in scalar_refs]

        for idx, st in enumerate(stages):
            srcs = [env[s] for s in st.in_slots]
            n_in = len(srcs)

            def access_fn(k, offset, srcs=srcs):
                s = srcs[k]
                for d in range(rank):
                    if offset[d]:
                        size = win if d == 0 else shape[d]
                        s = pallas_backend.wrap_shift(s, d, offset[d], size)
                return s

            svals = []
            for sb in st.scalars:
                if sb[0] == "arg":
                    svals.append(arg_vals[sb[1]])
                else:
                    svals.append(
                        jnp.asarray(
                            sb[1], jnp_backend._scalar_dtype(sb[2])
                        )
                    )
            y = jnp_backend.eval_scalar_dag(
                st.op.region(0), rank, n_in, access_fn, global_iota,
                svals, pinned=False,
            )[0]
            y = jnp.broadcast_to(jnp.asarray(y, dtype), wshape)
            b: Bounds = st.op.attrs["bounds"]
            if b != outer:
                mask = None
                for d in range(rank):
                    iv = global_iota(d)
                    m = (iv >= b.lb[d]) & (iv < b.ub[d])
                    mask = m if mask is None else (mask & m)
                y = jnp.where(mask, y, srcs[0])
            env[st.out_slot] = y
            # drop dead values so Mosaic's liveness matches the budget
            for s in list(env):
                if last_use.get(s, -1) <= idx and s != final_slot:
                    del env[s]

        out_ref[...] = jax.lax.slice_in_dim(
            env[final_slot], hp, hp + slab, axis=0
        )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_f)]
    for _ in range(n_start + n_scalars):
        in_specs.append(
            pl.BlockSpec(
                (1, 1),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (slab,) + shape[1:],
        lambda i: (jnp.asarray(i, jnp.int32),) + (jnp.int32(0),) * (rank - 1),
        memory_space=pltpu.VMEM,
    )
    scratch_shapes = [
        pltpu.VMEM((2,) + wshape, dtype) for _ in range(n_f)
    ] + [pltpu.SemaphoreType.DMA((n_f, 2, 3))]

    n_offsets = sum(
        len(set((st.op.attrs.get("shape") or StencilShape(())).offsets)) or 1
        for st in stages
    )
    cost = pl.CostEstimate(
        flops=2 * n_offsets * math.prod(shape),
        bytes_accessed=(n_f + 1) * math.prod(shape) * dtype.itemsize,
        transcendentals=0,
    )

    call_inputs = [jnp.asarray(x, dtype) for x in fields]
    if global_start is not None:
        for d in range(rank):
            call_inputs.append(
                jnp.asarray(global_start[d], jnp.int32).reshape(1, 1)
            )
    call_inputs.extend(
        jnp.asarray(s, dt).reshape(1, 1)
        for s, dt in zip(scalars, plan["scalar_dtypes"])
    )
    kwargs = {}
    # working-set estimate must mirror the planner's accounting (2 scratch
    # windows per field + the peak live intermediates + the out blocks) —
    # undercounting skips the vmem_limit raise and Mosaic then rejects a
    # plan the planner declared eligible
    est_bytes = math.prod(shape[1:]) * dtype.itemsize * (
        (2 * n_f + plan["peak"] + 1) * win + 2 * slab
    )
    if not interpret and est_bytes > 14 * 1024 * 1024:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
        **kwargs,
    )(*call_inputs)


def chain_callable(module: Module, name: str):
    """A (fields..., scalars...) -> array callable running @name's whole
    chain in one HBM pass, or None if ineligible. Whole-grid entry point
    (static coordinates) used by the executor's opdef dispatch."""
    from ..config import config
    from . import pallas_backend

    if not (pallas_backend._on_tpu() or config.pallas_interpret):
        return None
    plan = chain_plan(module, name)
    if plan is None:
        return None
    n_f, n_s = plan["n_fields"], plan["n_scalars"]

    shape = plan["shape"]

    def run(*args):
        if len(args) != n_f + n_s:
            raise TypeError(
                f"@{name} expects {n_f + n_s} args, got {len(args)}"
            )
        for i, a in enumerate(args[:n_f]):
            got = getattr(a, "shape", None)
            if got != shape:
                # same contract as _make_callable: mis-shaped inputs are a
                # TypeError, never a silently truncated window pass
                raise TypeError(
                    f"@{name} arg {i}: shape {got} != declared {shape}"
                )
        return execute_chain(
            plan,
            args[:n_f],
            args[n_f:],
            interpret=config.pallas_interpret,
        )

    run.__name__ = f"neptune_chain_{name}"
    return run
