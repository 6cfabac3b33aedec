"""Temporal-blocking Pallas kernel: K fused stencil sweeps per HBM pass.

A single sweep of a star stencil at HBM-resident sizes is bandwidth-bound:
the roofline is one read + one write per cell per sweep. Fixed-point
iterations (Jacobi relaxation, Richardson smoothing, explicit time stepping
x <- A x) apply the SAME operator K times, and the reference runs them as K
separate kernel invocations (explicit stepping re-enters the compiled kernel
per step: `NeptunePETScRuntime.cpp:638-714` method=2 forward-Euler calls
rhs_sym once per time_advance, driven from a host loop), paying K full HBM
round trips. This kernel restructures the loop so each grid slab
is fetched ONCE into VMEM with a K*h-deep halo window and relaxed K times
on-chip before the result is written back:

    HBM traffic:  (slab + 2*Hp) read + slab written   per K sweeps
    vs.           K * 2 * slab                        for K separate sweeps

i.e. an ~2K/(2+2Hp/slab)x effective-bandwidth multiplier, which moves the
kernel past the single-sweep roofline entirely (the remaining bound is VPU
compute at VMEM-resident speed).

Mechanics (built on the rolling-window DMA machinery of
`pallas_backend._execute_dma`, validated on v5e):
  * grid walks slabs along dim 0; each step DMAs a window of
    `win = slab + 2*Hp` rows (Hp = K*h0 padded to the 8-row sublane
    alignment) into a double-buffered VMEM scratch, overlapping the next
    window's fetch with this window's K sweeps;
  * the ring head-copy fetch (`pallas_backend._ring_window_io`) keeps
    window row r = global row `i*slab - Hp + r` on every step with no
    clamp or realignment roll; at the array edges the sticking-out rows
    are true torus rows (periodic whole-grid domains: two wrapped edge
    DMAs) or stale garbage (bounded domains) — see the creep analysis;
  * each of the K (Python-unrolled) sweeps evaluates the operator's scalar
    DAG over the FULL window via vector rolls, then applies the
    copy-through boundary mask (global-coordinate iota vs the apply bounds)
    with the previous sweep's value as the seed. By induction the seed at
    in-domain boundary rows is the original input — exactly K-fold
    copy-through apply semantics;
  * validity creep: a dim-0 roll read wraps at the window edge, so after
    sweep t only window rows [t*h0, win - t*h0) are trustworthy. The
    extracted center [Hp, Hp + slab) needs K*h0 <= Hp, which the window
    construction guarantees. Dim 1 stays whole in VMEM, so there is no
    dim-1 creep (edge wrap lands in boundary-masked columns).

Scope: rank-2 and rank-3, float32, single-input/single-output applies;
periodic domains are eligible for the one-level window at FULL domain
(interior-bounded periodic ops fall back — the copy-through mask evaluates
global coordinates, which are wrong at wrapped rows). Rank-3 windows
hold whole (N1, N2) planes per dim-0 row, so their working set is large:
they run under a raised Mosaic scoped-vmem limit with small slabs, trading
window-recompute overhead (win/slab ≤ 3) for the K-fold HBM saving.
Rank-2 rows too wide for a profitable one-level slab (past 8192² f32 at
h0=2, K>8) switch to the two-level variant (`_sweeps_window2_impl`): dim 1
is tiled into haloed panels as well, with clamp repair and validity creep
in both dims.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ir.core import Module, Operation
from ..ir.types import Bounds, StencilShape, TempType
from . import jnp_backend, pallas_backend

# this kernel holds 2 window scratches + ~3 live window values + the
# double-buffered out block; budget sized so a 4096-wide f32 grid gets a
# 64-row slab (measured fit under the 16MB scoped-vmem limit on v5e)
_VMEM_BUDGET = 9 * 1024 * 1024
# Cap the fused depth at K * h0 <= 48 halo rows (padded to 8). This is a
# compile-time guard (K unrolled sweeps of rolls), not the profitability
# bound: best_depth's slab >= 4*hp criterion is what rejects depths whose
# window-recompute overhead eats the HBM saving, and the VMEM-budget slab
# fit already shrinks eligibility at wide rows. Raised from 24 (which
# capped 4th-order h0=2 stencils at K<=12): with the recompute criterion in
# place the extra headroom only admits configurations that measure faster.
_MAX_HP = 48


def find_sweep_apply(
    module: Module, name: str, allow_periodic: bool = False
) -> Optional[Operation]:
    """The single apply op of a unary opdef eligible for temporal blocking.

    Returns None (caller falls back to K separate sweeps) unless the opdef
    body is exactly one self-shaped apply: one temp input, one result,
    float32, rank 2 or 3, with a nonzero dim-0 halo. allow_periodic lets
    the resident kernel (rolls ARE torus wrap) and the one-level window
    (ring fetch with wrapped edge DMAs; full-domain only, enforced by
    sweeps_plan) take periodic operators.
    """
    fn = module.lookup(name)
    if not getattr(fn, "is_opdef", False):
        return None
    # one temp input (the sweep state) + optional trailing scalar params
    if len(fn.ftype.results) != 1 or not fn.ftype.inputs:
        return None
    if not isinstance(fn.ftype.inputs[0], TempType) or any(
        isinstance(t, TempType) for t in fn.ftype.inputs[1:]
    ):
        return None
    apply_op = None
    for op in fn.body.ops:
        if op.name == "neptune.apply":
            if apply_op is not None:
                return None  # multi-stage opdef: composed reach not handled
            apply_op = op
        elif op.name not in ("neptune.return", "arith.constant"):
            return None
    if apply_op is None:
        return None
    out_type: TempType = apply_op.results[0].type
    if out_type.element != "float32":  # rolls need 32-bit; f64 is jnp-only
        return None
    if out_type.bounds.rank not in (2, 3):
        return None
    if apply_op.attrs.get("periodic") and not allow_periodic:
        return None
    n_in = apply_op.attrs.get("num_inputs", len(apply_op.operands))
    if n_in != 1 or len(apply_op.results) != 1:
        return None
    if apply_op.operands[0].uid != fn.body.args[0].uid:
        return None
    # scalar operands must be exactly the opdef's trailing args in order
    # (the kernel binds user-supplied scalars to SMEM slots positionally)
    if [o.uid for o in apply_op.operands[1:]] != [
        a.uid for a in fn.body.args[1:]
    ]:
        return None
    if apply_op.operands[0].type.bounds != out_type.bounds:
        return None
    sshape: StencilShape = apply_op.attrs.get("shape") or StencilShape(())
    if not sshape.offsets:
        return None
    halos = [max(h) for h in sshape.halo()]
    shp = out_type.bounds.shape
    if halos[0] < 1:
        return None
    if any(h >= s for h, s in zip(halos, shp)):
        return None
    return apply_op


# rank-3 windows hold whole (N1, N2) planes per row; they need Mosaic's
# scoped-vmem limit raised (v5e: 128MB physical; 64MB requested) and a
# budget sized so 256^3 f32 (256KB per dim-0 row) gets a 16-row slab
_VMEM_BUDGET_3D = 48 * 1024 * 1024


# rank-2 escalation budget: when the 9MB-budget slab lands under the
# 4*hp profitability bar (wide h0 stencils at wide rows force hp up while
# row_bytes squeezes the slab), retry with more scoped VMEM — v5e has 128MB
# per core and the pallas_call already raises Mosaic's limit for working
# sets past the default 16MB stack. A deeper fused K at a somewhat worse
# per-pass overlap still wins: the HBM saving scales with K.
_VMEM_BUDGET_WIDE = 28 * 1024 * 1024


def _pick_slab(
    extent0: int, row_bytes: int, hp: int, rank: int, budget: int | None = None
) -> Optional[int]:
    """Largest 8-aligned divisor of extent0 fitting the window working set:
    2 scratch windows + ~3 live window values + 2 out blocks."""
    if budget is None:
        budget = _VMEM_BUDGET if rank == 2 else _VMEM_BUDGET_3D
    # the kernel's pl.multiple_of(window_start, 8) proof needs slab, hp,
    # and extent0-win all 8-aligned, which requires extent0 itself to be:
    # a non-8-multiple extent could otherwise admit a misaligned slab
    # (e.g. 500 rows -> slab=100, interior window starts at 92, 192, ...)
    if extent0 % 8:
        return None
    # (5*win + 2*slab) * row_bytes <= budget, win = slab + 2*hp
    s = (budget // max(row_bytes, 1) - 10 * hp) // 7
    # the window (slab + 2*hp rows) must fit inside the array
    s = min((s // 8) * 8, extent0 - 2 * hp)
    for cand in range(s, 7, -8):
        if extent0 % cand == 0:
            return cand
    return None


def _pick_slab_rank2(extent0: int, row_bytes: int, hp: int) -> Optional[int]:
    """Rank-2 slab: default budget first; if that slab misses the 4*hp
    profitability bar, escalate the budget before giving up on the depth."""
    slab = _pick_slab(extent0, row_bytes, hp, 2)
    if slab is not None and slab >= 4 * hp:
        return slab
    wide = _pick_slab(extent0, row_bytes, hp, 2, budget=_VMEM_BUDGET_WIDE)
    if wide is not None and wide >= 4 * hp:
        return wide
    return slab


# minimum two-level panel width: narrower panels pay the column-halo
# re-read + strided-DMA cost on too little useful work
_PANEL_MIN = 512


def _pick_panels(extent0, extent1, itemsize, hp, h1, k):
    """Two-level geometry (slab, pw, hp1c, win1) for rows too wide for the
    single-level window, or None.

    The window is tiled in BOTH dims: dim-0 slabs as before, dim-1 panels
    of pw columns fetched with hp1c = K*h1 halo columns (padded to the
    128-lane tile) each side. Shrinking the effective row to win1 bytes is
    what lets `_pick_slab` reach the slab >= 4*hp profitability bar at
    widths where even the escalated budget cannot. Panels are tried widest
    first (fewest halo-column re-reads); column overhead is capped at 1.5x
    like the dim-0 recompute bar."""
    hp1c = ((k * h1 + 127) // 128) * 128 if h1 else 0
    pw = (extent1 // 2 // 128) * 128
    while pw >= _PANEL_MIN:
        if extent1 % pw == 0:
            win1 = pw + 2 * hp1c
            if win1 <= extent1 and 2 * win1 <= 3 * pw:
                slab = _pick_slab(
                    extent0, win1 * itemsize, hp, 2,
                    budget=_VMEM_BUDGET_WIDE,
                )
                if slab is not None and slab >= 4 * hp:
                    return slab, pw, hp1c, win1
        pw -= 128
    return None


def _plan_geometry(shape, halos, k: int, itemsize: int) -> Optional[dict]:
    """Slab / two-level window geometry shared by the whole-grid
    (`sweeps_plan`) and sharded-local (`local_window_plan`) planners."""
    rank = len(shape)
    h0 = halos[0]
    hp = ((k * h0 + 7) // 8) * 8
    if hp > _MAX_HP:
        return None
    # lane extent must be 128-tile-aligned: the window kernels slice the
    # HBM memref manually and Mosaic rejects unaligned lane extents on
    # hardware (the multi-copy/jnp fallbacks handle those shapes)
    if shape[-1] % 128 or math.prod(shape) < 64 * 128:
        return None
    row_bytes = math.prod(shape[1:]) * itemsize
    slab = (
        _pick_slab_rank2(shape[0], row_bytes, hp)
        if rank == 2
        else _pick_slab(shape[0], row_bytes, hp, rank)
    )
    if rank == 2 and (slab is None or slab < 4 * hp):
        # rows too wide for a profitable one-level slab even at the
        # escalated budget: tile dim 1 into haloed panels too
        two = _pick_panels(shape[0], shape[1], itemsize, hp, halos[1], k)
        if two is not None:
            slab2, pw, hp1c, win1 = two
            win = slab2 + 2 * hp
            if win <= shape[0] and slab2 >= hp:
                return {
                    "slab": slab2, "hp": hp, "win": win, "h0": h0,
                    "two_level": True, "pw": pw, "hp1c": hp1c,
                    "win1": win1, "h1": halos[1],
                }
    if slab is None:
        return None
    win = slab + 2 * hp
    # interior slabs must never hit the window clamp (edge repair assumes
    # only the first/last slab shift), which needs slab >= hp
    if win > shape[0] or slab < hp:
        return None
    return {"slab": slab, "hp": hp, "win": win, "h0": h0}


def sweeps_plan(module: Module, name: str, k: int) -> Optional[dict]:
    """Geometry for a K-sweep fused kernel, or None if ineligible.

    Periodic operators are eligible for the ONE-LEVEL window since round 4
    (the ring fetch's wrapped edge DMAs give the first/last windows true
    torus rows, and the validity-creep recurrence is then identical to the
    bounded case) — but only at FULL domain: an interior copy-through mask
    evaluates global coordinates, and the wrapped rows' coordinates lie
    outside [lb, ub), so the mask would freeze cells that torus semantics
    requires to keep evolving. Interior-bounded periodic ops and the
    two-level window (whose dim-1 panels still clamp) fall back.
    """
    op = find_sweep_apply(module, name, allow_periodic=True)
    if op is None or k < 2:
        return None
    out_type: TempType = op.results[0].type
    if op.attrs.get("periodic") and op.attrs["bounds"] != out_type.bounds:
        return None
    sshape: StencilShape = op.attrs["shape"]
    halos = [max(h) for h in sshape.halo()]
    g = _plan_geometry(
        out_type.bounds.shape, halos, k,
        jnp.dtype(out_type.element).itemsize,
    )
    if g is None or (op.attrs.get("periodic") and g.get("two_level")):
        return None
    return {"op": op, **g}


# grids at or below this many bytes run the whole-array VMEM-resident
# variant: one block, K sweeps of pure vector rolls, in+out crossing HBM
# once per call. Also the only variant that supports periodic operators
# (wraparound rolls ARE the torus semantics).
_RESIDENT_BYTES = 4 * 1024 * 1024
_RESIDENT_MAX_K = 32  # per-call unroll cap (compile time); chain beyond


def resident_plan(module: Module, name: str, k: int) -> Optional[Operation]:
    """Eligibility for the whole-grid VMEM-resident K-sweep kernel."""
    op = find_sweep_apply(module, name, allow_periodic=True)
    if op is None or k < 2:
        return None
    out_type: TempType = op.results[0].type
    shape = out_type.bounds.shape
    if math.prod(shape) < 64 * 128 or shape[-1] < 128:
        return None
    if math.prod(shape) * jnp.dtype(out_type.element).itemsize > _RESIDENT_BYTES:
        return None
    return op


def execute_sweeps_resident(
    module: Module,
    name: str,
    x,
    scalars: Sequence,
    k: int,
    *,
    interpret: bool = False,
):
    """K fused sweeps with the whole grid resident in VMEM (one block).

    No halo window, no validity creep: rolls wrap at the array edge, which
    for periodic operators is exactly the torus semantics and for bounded
    operators lands in the boundary-masked (copy-through) ring.
    """
    op = resident_plan(module, name, k)
    assert op is not None, "execute_sweeps_resident on an ineligible opdef"
    out_type: TempType = op.results[0].type
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    shape = outer.shape
    rank = len(shape)
    dtype = jnp.dtype(out_type.element)
    body = op.region(0)
    full_domain = bounds == outer
    n_scalars = len(scalars)

    def kernel(*refs):
        in_ref = refs[0]
        scalar_refs = refs[1 : 1 + n_scalars]
        out_ref = refs[1 + n_scalars]

        if full_domain:
            mask = None
        else:
            m = None
            for d in range(rank):
                iv = jax.lax.broadcasted_iota(jnp.int32, shape, d) + outer.lb[d]
                md = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                m = md if m is None else (m & md)
            mask = m

        def index_fn(d):
            return (
                jax.lax.broadcasted_iota(jnp.int32, shape, d) + outer.lb[d]
            )

        scalar_vals = [r[0, 0] for r in scalar_refs]
        v = in_ref[...]
        for _sweep in range(k):
            src = v

            def access_fn(_k, offset, src=src):
                s = src
                for d in range(rank):
                    if offset[d]:
                        s = pallas_backend.wrap_shift(s, d, offset[d], shape[d])
                return s

            y = jnp_backend.eval_scalar_dag(
                body, rank, 1, access_fn, index_fn, scalar_vals, pinned=False
            )[0]
            y = jnp.broadcast_to(jnp.asarray(y, dtype), shape)
            v = y if mask is None else jnp.where(mask, y, src)
        out_ref[...] = v

    zeros = (0,) * rank
    in_specs = [
        pl.BlockSpec(shape, lambda: zeros, memory_space=pltpu.VMEM)
    ]
    for _ in range(n_scalars):
        in_specs.append(
            pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM)
        )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    call_inputs = [jnp.asarray(x, dtype)]
    call_inputs.extend(jnp.asarray(s).reshape(1, 1) for s in scalars)
    n_offsets = len(set(op.attrs["shape"].offsets)) or 1
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(shape, lambda: zeros, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_offsets * k * math.prod(shape),
            bytes_accessed=2 * math.prod(shape) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
        **kwargs,
    )(*call_inputs)


def best_depth(module: Module, name: str, k: int) -> Optional[int]:
    """The fused depth to run per kernel call for a total of k sweeps.

    Deep fusion forces small slabs (the window working set grows with
    K*h0), and measured on v5e the halo-recompute overhead then eats the
    bandwidth win (K=8/slab=64: 2.1x single-sweep; K=16/slab=32: 1.2x). So
    the depth is capped where slab >= 4*hp (window overhead <= 1.5x), and
    the executor chains ceil(k/depth) kernel calls. Depths dividing k are
    preferred (no leftover single sweeps).
    """
    if resident_plan(module, name, k) is not None:
        cap = min(k, _RESIDENT_MAX_K)
        for d in [x for x in range(cap, 1, -1) if k % x == 0] + [cap]:
            return d
    op = find_sweep_apply(module, name, allow_periodic=True)
    if op is None or k < 2:
        return None
    rank = op.results[0].type.bounds.rank
    h0 = max(op.attrs["shape"].halo()[0])
    cap = min(k, _MAX_HP // max(h0, 1))
    divisors = [d for d in range(cap, 1, -1) if k % d == 0]
    rest = [d for d in range(cap, 1, -1) if k % d != 0]
    for d in divisors + rest:
        plan = sweeps_plan(module, name, d)
        if plan is None:
            continue
        # rank 2: slab >= 4*hp keeps window-recompute overhead <= 1.5x
        # (measured, see docstring). rank 3: slabs are necessarily small
        # (whole planes per row), so accept up to 2x recompute — the
        # K-fold HBM saving dominates.
        ok = (
            plan["slab"] >= 4 * plan["hp"]
            if rank == 2
            else plan["win"] <= 2 * plan["slab"]
        )
        if ok:
            return d
    return None


def execute_sweeps(
    module: Module,
    name: str,
    x,
    scalars: Sequence,
    k: int,
    *,
    interpret: bool = False,
):
    """Run K fused sweeps of opdef @name over x in one pallas_call.

    Caller must have checked eligibility (best_depth is not None).
    """
    if resident_plan(module, name, k) is not None:
        return execute_sweeps_resident(
            module, name, x, scalars, k, interpret=interpret
        )
    plan = sweeps_plan(module, name, k)
    assert plan is not None, "execute_sweeps on an ineligible opdef"
    impl = _sweeps_window2_impl if plan.get("two_level") else _sweeps_window_impl
    return impl(
        plan["op"], x, scalars, k, plan, global_start=None, interpret=interpret
    )


def _creep_row_slices(k: int, hp: int, h0: int, align: int):
    """Static per-sweep dim-0 shrink offsets exploiting the validity creep.

    Sweep t (0-based, k total) only has to produce correct values in the
    absolute window rows the REMAINING sweeps read: the extracted center
    [hp, hp+slab) expanded by (k-1-t)*h0 on each side. Evaluating a slice
    wraps its shift reads at the slice edge, so the slice needs an extra
    h0 garbage margin: lo_t = floor((hp - (k-1-t)*h0 - h0)/align)*align,
    clamped at 0. lo_t is monotone nondecreasing, so each sweep's input is
    a plain slice of the previous sweep's (shrinking) output — no
    re-expansion copy is ever needed. At K=16, h0=2 (hp=32) this removes
    ~12.5% of the per-sweep VPU work that the full-window evaluation pays
    in halo rows nobody will read again.
    """
    los = []
    for t in range(k):
        rem = (k - 1 - t) * h0
        los.append(max(0, (hp - rem - h0) // align * align))
    return los


def _sweeps_window_impl(
    op: Operation,
    x,
    scalars: Sequence,
    k: int,
    plan: dict,
    *,
    global_start=None,
    interpret: bool = False,
):
    """The K-fused rolling-window kernel, shared between the whole-grid and
    sharded-local entry points.

    global_start=None: static coordinate bases (outer.lb folds into the
    iotas — the whole-grid case). Otherwise a sequence of traced int32
    global coordinates of row 0 per dim, fed through SMEM scalars (the
    shard_map case, where each shard sees a different window and the
    copy-through masks must be computed against runtime coordinates).
    """
    slab, hp, win = plan["slab"], plan["hp"], plan["win"]
    shape = tuple(x.shape)

    out_type: TempType = op.results[0].type
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = len(shape)
    wshape = (win,) + shape[1:]
    dtype = jnp.dtype(out_type.element)
    n_slabs = shape[0] // slab
    # sharded-local calls (traced global_start) keep the bounded-garbage
    # edge contract: their band fixups recompute the edges either way
    periodic = bool(op.attrs.get("periodic")) and global_start is None
    body = op.region(0)
    full_domain = bounds == outer
    n_scalars = len(scalars)
    n_start = 0 if global_start is None else rank

    def kernel(*refs):
        hbm_ref = refs[0]
        start_refs = refs[1 : 1 + n_start]
        scalar_refs = refs[1 + n_start : 1 + n_start + n_scalars]
        out_ref = refs[1 + n_start + n_scalars]
        scratch = refs[2 + n_start + n_scalars]  # (2,) + wshape VMEM
        sems = refs[3 + n_start + n_scalars]  # (1, 2, 3) DMA semaphores

        i = pl.program_id(0)

        # Ring head-copy fetch (shared with the single-sweep DMA kernels):
        # window row r holds global row i*slab - hp + r on every step with
        # no clamp and no realignment roll. Bounded domains leave the
        # array-edge rows stale (out-of-domain garbage the validity creep
        # absorbs, exactly as the round-3 clamp+roll scheme did); periodic
        # whole-grid domains fetch true torus rows there instead, making
        # the creep recurrence identical to the interior case.
        from .pallas_backend import _ring_window_io

        _ring_window_io(
            i, [hbm_ref], [scratch], sems,
            n_in=1, slab=slab, h0p=hp, win=win, n_slabs=n_slabs,
            N=shape[0], al=8, periodic=periodic,
        )
        v = scratch[i % 2]

        def base_of(d):
            if global_start is None:
                return jnp.int32(outer.lb[d])
            return start_refs[d][0, 0]

        def global_iota(d):
            iv = jax.lax.broadcasted_iota(jnp.int32, wshape, d)
            if d == 0:
                return iv + i * slab - jnp.int32(hp) + base_of(0)
            return iv + base_of(d)

        if full_domain:
            mask = None
        else:
            mask = None
            for d in range(rank):
                iv = global_iota(d)
                md = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                mask = md if mask is None else (mask & md)

        scalar_vals = [r[0, 0] for r in scalar_refs]

        h0 = plan["h0"]
        al = 16 if dtype.itemsize == 2 else 8
        cur = 0  # absolute window row held at v[0] (creep shrink offset)
        for lo in _creep_row_slices(k, hp, h0, al):
            swin = win - 2 * lo
            src = (
                v if lo == cur
                else jax.lax.slice_in_dim(v, lo - cur, lo - cur + swin, axis=0)
            )
            sshape = (swin,) + wshape[1:]

            def access_fn(_k, offset, src=src, swin=swin):
                s = src
                for d in range(rank):
                    if offset[d]:
                        size = swin if d == 0 else shape[d]
                        s = pallas_backend.wrap_shift(s, d, offset[d], size)
                return s

            def s_iota(d, lo=lo, sshape=sshape):
                iv = jax.lax.broadcasted_iota(jnp.int32, sshape, d)
                if d == 0:
                    return iv + i * slab - jnp.int32(hp - lo) + base_of(0)
                return iv + base_of(d)

            y = jnp_backend.eval_scalar_dag(
                body, rank, 1, access_fn, s_iota, scalar_vals, pinned=False
            )[0]
            y = jnp.broadcast_to(jnp.asarray(y, dtype), sshape)
            if mask is not None:
                m = (
                    mask if lo == 0
                    else jax.lax.slice_in_dim(mask, lo, lo + swin, axis=0)
                )
                y = jnp.where(m, y, src)
            v, cur = y, lo

        out_ref[...] = jax.lax.slice_in_dim(
            v, hp - cur, hp - cur + slab, axis=0
        )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
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
        pltpu.VMEM((2,) + wshape, dtype),
        pltpu.SemaphoreType.DMA((1, 2, 3)),
    ]

    n_offsets = len(set(op.attrs["shape"].offsets)) or 1
    cost = pl.CostEstimate(
        flops=2 * n_offsets * k * math.prod(shape),
        bytes_accessed=2 * math.prod(shape) * dtype.itemsize,
        transcendentals=0,
    )

    call_inputs = [jnp.asarray(x, dtype)]
    if global_start is not None:
        for d in range(rank):
            call_inputs.append(
                jnp.asarray(global_start[d], jnp.int32).reshape(1, 1)
            )
    call_inputs.extend(jnp.asarray(s).reshape(1, 1) for s in scalars)
    kwargs = {}
    est_bytes = math.prod(shape[1:]) * dtype.itemsize * (7 * slab + 10 * hp)
    if not interpret and est_bytes > 14 * 1024 * 1024:
        # only when the working set would overflow Mosaic's default 16MB
        # scoped-vmem stack (v5e has 128MB per core); measured on v5e the
        # small-slab default-limit configuration is faster, so this path is
        # a safety valve, not the default
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



def _sweeps_window2_impl(
    op: Operation,
    x,
    scalars: Sequence,
    k: int,
    plan: dict,
    *,
    global_start=None,
    interpret: bool = False,
):
    """The two-level (dim-0 slabs x dim-1 panels) K-fused window kernel.

    Same temporal-blocking contract as `_sweeps_window_impl`, for rank-2
    grids whose rows are too wide for a profitable one-level slab: the
    grid walks (panel, slab) positions; each step DMAs a
    (slab + 2*hp) x (pw + 2*hp1c) window — a strided 2-D HBM slice — into
    the double-buffered scratch, repairs the edge clamps with dynamic
    rolls in BOTH dims, runs the K unrolled sweeps, and writes back the
    (slab, pw) center. Validity creep is now two-dimensional: after sweep
    t the trustworthy region is rows [t*h0, win-t*h0) x cols
    [t*h1, win1-t*h1); the center needs K*h0 <= hp and K*h1 <= hp1c,
    guaranteed by `_pick_panels` (hp1c = K*h1 padded to the 128-lane
    tile, which also keeps every column window start lane-aligned).

    HBM traffic per K sweeps: (win1/pw)x read + 1x write of the grid vs
    2K for K separate sweeps — the column-halo re-read is capped at 1.5x
    by the planner, so the K-fold saving dominates.
    """
    slab, hp, win = plan["slab"], plan["hp"], plan["win"]
    pw, hp1c, win1 = plan["pw"], plan["hp1c"], plan["win1"]
    shape = tuple(x.shape)

    out_type: TempType = op.results[0].type
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = len(shape)
    assert rank == 2, "two-level window is rank-2 only"
    wshape = (win, win1)
    dtype = jnp.dtype(out_type.element)
    n_slabs = shape[0] // slab
    n_panels = shape[1] // pw
    body = op.region(0)
    full_domain = bounds == outer
    n_scalars = len(scalars)
    n_start = 0 if global_start is None else rank

    def kernel(*refs):
        hbm_ref = refs[0]
        start_refs = refs[1 : 1 + n_start]
        scalar_refs = refs[1 + n_start : 1 + n_start + n_scalars]
        out_ref = refs[1 + n_start + n_scalars]
        scratch = refs[2 + n_start + n_scalars]  # (2,) + wshape VMEM
        sems = refs[3 + n_start + n_scalars]  # (2,) DMA semaphores

        p = pl.program_id(0)
        i = pl.program_id(1)
        step = p * jnp.int32(n_slabs) + i

        def row_start(si):
            ideal = si * slab - hp
            w = jnp.clip(
                ideal, jnp.int32(0), jnp.int32(shape[0] - win)
            ).astype(jnp.int32)
            return pl.multiple_of(w, 8)

        def col_start(pi):
            ideal = pi * pw - hp1c
            w = jnp.clip(
                ideal, jnp.int32(0), jnp.int32(shape[1] - win1)
            ).astype(jnp.int32)
            return pl.multiple_of(w, 128)

        def start_fetch(pi, si, slot):
            pltpu.make_async_copy(
                hbm_ref.at[
                    pl.ds(row_start(si), win), pl.ds(col_start(pi), win1)
                ],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        @pl.when(step == 0)
        def _():
            start_fetch(jnp.int32(0), jnp.int32(0), 0)

        @pl.when(step + 1 < n_panels * n_slabs)
        def _():
            # next grid step: same panel's next slab, or the next panel's
            # first slab (the inner grid dim varies fastest)
            last = i + 1 >= n_slabs
            pn = jnp.where(last, p + 1, p)
            sn = jnp.where(last, jnp.int32(0), i + 1)
            start_fetch(pn, sn, (step + 1) % 2)

        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(jnp.int32(0), win), pl.ds(jnp.int32(0), win1)],
            scratch.at[step % 2],
            sems.at[step % 2],
        ).wait()

        # repair the edge clamps: after the rolls, window cell (r, c)
        # holds global (i*slab - hp + r, p*pw - hp1c + c); wrapped rows/
        # cols are garbage covered by the creep margins
        v = scratch[step % 2]
        d0 = (i * slab - jnp.int32(hp)) - row_start(i)
        v = pltpu.roll(v, ((-d0) % win).astype(jnp.int32), axis=0)
        d1 = (p * pw - jnp.int32(hp1c)) - col_start(p)
        v = pltpu.roll(v, ((-d1) % win1).astype(jnp.int32), axis=1)

        def base_of(d):
            if global_start is None:
                return jnp.int32(outer.lb[d])
            return start_refs[d][0, 0]

        def global_iota(d):
            iv = jax.lax.broadcasted_iota(jnp.int32, wshape, d)
            if d == 0:
                return iv + i * slab - jnp.int32(hp) + base_of(0)
            return iv + p * pw - jnp.int32(hp1c) + base_of(1)

        if full_domain:
            mask = None
        else:
            mask = None
            for d in range(rank):
                iv = global_iota(d)
                md = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                mask = md if mask is None else (mask & md)

        scalar_vals = [r[0, 0] for r in scalar_refs]

        h0 = plan["h0"]
        al = 16 if dtype.itemsize == 2 else 8
        cur = 0  # absolute window row held at v[0] (creep shrink offset)
        for lo in _creep_row_slices(k, hp, h0, al):
            swin = win - 2 * lo
            src = (
                v if lo == cur
                else jax.lax.slice_in_dim(v, lo - cur, lo - cur + swin, axis=0)
            )
            sshape = (swin, win1)

            def access_fn(_k, offset, src=src, swin=swin):
                s = src
                for d in range(rank):
                    if offset[d]:
                        size = swin if d == 0 else win1
                        s = pallas_backend.wrap_shift(s, d, offset[d], size)
                return s

            def s_iota(d, lo=lo, sshape=sshape):
                iv = jax.lax.broadcasted_iota(jnp.int32, sshape, d)
                if d == 0:
                    return iv + i * slab - jnp.int32(hp - lo) + base_of(0)
                return iv + p * pw - jnp.int32(hp1c) + base_of(1)

            y = jnp_backend.eval_scalar_dag(
                body, rank, 1, access_fn, s_iota, scalar_vals,
                pinned=False,
            )[0]
            y = jnp.broadcast_to(jnp.asarray(y, dtype), sshape)
            if mask is not None:
                m = (
                    mask if lo == 0
                    else jax.lax.slice_in_dim(mask, lo, lo + swin, axis=0)
                )
                y = jnp.where(m, y, src)
            v, cur = y, lo

        out_ref[...] = jax.lax.slice(
            v, (hp - cur, hp1c), (hp - cur + slab, hp1c + pw)
        )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for _ in range(n_start + n_scalars):
        in_specs.append(
            pl.BlockSpec(
                (1, 1),
                lambda p, i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (slab, pw),
        lambda p, i: (jnp.asarray(i, jnp.int32), jnp.asarray(p, jnp.int32)),
        memory_space=pltpu.VMEM,
    )
    scratch_shapes = [
        pltpu.VMEM((2,) + wshape, dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    n_offsets = len(set(op.attrs["shape"].offsets)) or 1
    cost = pl.CostEstimate(
        flops=2 * n_offsets * k * math.prod(shape),
        bytes_accessed=(
            math.prod(shape) * dtype.itemsize * (win1 + pw) // pw
        ),
        transcendentals=0,
    )

    call_inputs = [jnp.asarray(x, dtype)]
    if global_start is not None:
        for d in range(rank):
            call_inputs.append(
                jnp.asarray(global_start[d], jnp.int32).reshape(1, 1)
            )
    call_inputs.extend(jnp.asarray(s).reshape(1, 1) for s in scalars)
    kwargs = {}
    est_bytes = win1 * dtype.itemsize * (7 * slab + 10 * hp)
    if not interpret and est_bytes > 14 * 1024 * 1024:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(n_panels, n_slabs),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
        **kwargs,
    )(*call_inputs)


# ---------------------------------------------------------------------------
# local-shape window variant: the same K-fused rolling-window kernel over a
# sharded LOCAL core block whose global position is traced (shard_map). The
# mask coordinates come from SMEM scalars instead of static bounds; window
# clamp/roll garbage at the shard edges lands in the K*reach zones that
# `parallel.shardmap_sweeps` recomputes from exchanged strips afterwards.
# ---------------------------------------------------------------------------


def local_window_plan(op: Operation, shape, k: int) -> Optional[dict]:
    """Geometry for a K-sweep fused kernel over a local block of `shape`,
    or None if ineligible (mirrors sweeps_plan, parameterized by shape)."""
    out_type: TempType = op.results[0].type
    rank = len(shape)
    if rank not in (2, 3) or len(out_type.bounds.shape) != rank:
        return None
    if out_type.element != "float32":
        return None
    if op.attrs.get("periodic"):
        return None
    n_in = op.attrs.get("num_inputs", len(op.operands))
    if n_in != 1 or len(op.results) != 1:
        return None
    if op.operands[0].type.bounds != out_type.bounds:
        return None
    sshape: StencilShape = op.attrs.get("shape")
    if not sshape or not sshape.offsets:
        return None
    halos = [max(h) for h in sshape.halo()]
    if halos[0] < 1 or any(h >= s for h, s in zip(halos, shape)):
        return None
    if k < 2:
        return None
    # two-level note: clamp/roll garbage at block edges still lands
    # within K*reach of the edge in BOTH dims — the zones the sharded
    # caller recomputes from exchanged strips
    return _plan_geometry(
        tuple(shape), halos, k, jnp.dtype(out_type.element).itemsize
    )



def execute_sweeps_window_local(
    op: Operation,
    x,
    scalars: Sequence,
    k: int,
    global_start,
    *,
    interpret: bool = False,
):
    """K fused sweeps over a local core block with traced global coords.

    global_start[d]: traced int32 global logical coordinate of core row 0.
    Caller must have checked `local_window_plan(op, x.shape, k)`.
    """
    plan = local_window_plan(op, tuple(x.shape), k)
    assert plan is not None, "execute_sweeps_window_local on ineligible input"
    impl = _sweeps_window2_impl if plan.get("two_level") else _sweeps_window_impl
    return impl(
        op, x, scalars, k, plan, global_start=global_start, interpret=interpret
    )
