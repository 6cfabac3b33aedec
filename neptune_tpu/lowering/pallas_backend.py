"""Pallas TPU stencil kernels — the hand-tiled apply executor.

TPU-native analog of the reference's hot-loop construction
(`ApplyToSCFForLowering`, `lib/Passes/DataflowLowering.cpp:258-448`, which
emits rank-deep scf.for nests): each apply lowers to ONE `pallas_call` whose
grid walks **slabs along dim 0**, with halo coverage provided by passing the
same input array three times (previous/current/next slab blocks) under
shifted-and-clamped block index maps — the Pallas equivalent of ghost cells
(any dim-0 halo up to one slab). Within a slab the full extent of the
trailing dims lives in VMEM, so trailing-dim neighbor reads are static
slice+concat shifts (`wrap_shift`; measured faster than `pltpu.roll` —
since the round-4 ring-fetch rewrite no kernel in this module needs a
dynamic rotate at all), and dim-0 neighbor reads are static slices of the
halo-extended slab. The copy-through boundary contract is enforced in-kernel
with an index mask (computed from `program_id` + iota — no extra memory
traffic), exactly mirroring the jnp backend's mask-select semantics.

Supported: rank 2/3 applies on float32/bfloat16 (float64 falls back to the
jnp path — TPU f64 is VPU-emulated and XLA handles it as well as we could).
Everything else falls back to the jnp backend via `try_execute_apply -> None`.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..ir.core import Operation
from ..ir.types import Bounds, StencilShape, TempType
from . import jnp_backend

_SUPPORTED_DTYPES = ("float32", "bfloat16")
# VMEM working-set budget (bytes) for choosing the slab height; leaves
# headroom under the 16MB scoped-vmem limit for Mosaic's own temporaries
# (iota/mask/ext intermediates live on the kernel "stack")
_VMEM_BUDGET = 6 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pick_slab(extent0: int, row_bytes: int, n_copies: int, align: int = 8) -> int:
    """Largest align-multiple slab height whose working set fits the budget
    (align = the dtype's sublane tile: 8 for f32, 16 for bf16)."""
    # working set ≈ (n_copies inputs + out + iota/mask/ext temps) * slab rows
    denom = (n_copies + 8) * row_bytes
    s = max(align, _VMEM_BUDGET // max(denom, 1))
    s = min(s, extent0)
    s = max(align, (s // align) * align)
    # prefer a divisor of extent0 to avoid padded tail blocks
    for cand in range(s, align - 1, -align):
        if extent0 % cand == 0:
            return cand
    return min(s, extent0)


def supported(op: Operation) -> bool:
    out_type: TempType = op.results[0].type
    if out_type.element not in _SUPPORTED_DTYPES:
        return False
    rank = out_type.bounds.rank
    if rank not in (2, 3):
        return False
    # all temps must share the output domain exactly (the kernels assume
    # aligned physical arrays; lb-shifted inputs take the jnp path, which
    # applies the per-input storage-normalization correction)
    n_in = op.attrs.get("num_inputs", len(op.operands))
    for v in op.operands[:n_in]:
        if v.type.bounds != out_type.bounds:
            return False
    shape: StencilShape = op.attrs.get("shape") or StencilShape(())
    if shape.offsets:
        halo = shape.halo()
        extent0 = out_type.bounds.shape[0]
        if max(halo[0]) >= extent0:
            return False
    # trailing dims must be large enough that wraparound-roll garbage stays in
    # the masked (unspecified) zone; tiny grids go to the jnp path anyway
    if math.prod(out_type.bounds.shape) < 64 * 128:
        return False
    return True


def try_execute_apply(op: Operation, operand_arrays: Sequence) -> Optional[object]:
    """Lower one apply to a Pallas kernel, or return None to fall back."""
    if not supported(op):
        return None
    if not (_on_tpu() or config.pallas_interpret):
        return None
    if _dma_profitable(op):
        try:
            return _execute_dma(
                op, tuple(operand_arrays), interpret=config.pallas_interpret
            )
        except NotImplementedError:
            pass
    return _execute(op, tuple(operand_arrays), interpret=config.pallas_interpret)


def _dma_profitable(op: Operation, shape=None) -> bool:
    """The rolling-window DMA kernel pays off when the multi-copy path's
    (2h+1)x dim-0 read amplification bites: wide dim-0 halos (measured on
    v5e: 4th-order advection 74 -> 86 Gcell/s). For rank-2 h0 == 1 the
    multi-copy path's Mosaic-pipelined block fetches win (87 vs 68 Gcell/s
    at 4096^2), so narrow rank-2 stencils stay on it. Rank 3 always prefers
    the DMA kernel: the (N1, N2)-plane rows force tiny multi-copy slabs
    (3x read amplification, ~70% of roofline at 256^3), while the
    dims-0-1-collapsed rolling window reads each row ~1.1x (measured ~93%)."""
    sshape: StencilShape = op.attrs.get("shape") or StencilShape(())
    if not sshape.offsets:
        return False
    # Manual HBM window DMAs slice the input memref along dim 0 with the
    # trailing dims whole; Mosaic requires the sliced memref's LANE extent
    # to be tile-aligned ("Slice shape along dimension 2 must be aligned
    # to tiling (128)", observed on v5e at 64^3) — unaligned lane extents
    # fall back to the multi-copy path, whose BlockSpec pipeline handles
    # padding internally. `shape` is the physical array the kernel windows
    # over: the global grid on the whole-grid path, the LOCAL block under
    # shard_map (execute_apply_window).
    if shape is None:
        shape = op.results[0].type.bounds.shape
    if shape[-1] % 128:
        return False
    # bf16: the round-3 scheme's branched edge correction made the DMA
    # kernel LOSE to multi-copy at 2-byte elements (48.5 vs 73.8 Gcell/s,
    # advection 4096²); the round-4 ring fetch has no edge correction at
    # all and the trade FLIPPED (measured contention-normalized on v5e:
    # DMA ring 0.483 vs multi-copy 0.445 of achievable bandwidth,
    # bit-exact vs the jnp lowering) — bf16 now routes to the DMA kernel
    # under the same geometry rules as f32.
    if jnp.dtype(op.results[0].type.element).itemsize not in (2, 4):
        return False
    if op.results[0].type.bounds.rank == 3:
        return True
    h0 = max(sshape.halo()[0])
    return 2 <= h0 <= 8


def wrap_shift(arr, d: int, offset: int, size: int):
    """view[i] = arr[i + offset] with wraparound along axis d.

    Static shifts lower as two static slices + concat: measured ~20%
    faster than `pltpu.roll` on v5e for f32 (16-sweep 5-pt microbench,
    168 -> 133 us), and Mosaic cannot rotate non-32-bit data at all
    ("Rotate with non-32-bit data"), so concat is also the only bf16
    path. Dynamic (traced) shifts must keep using pltpu.roll.

    Shared neighbor-access primitive for every window kernel family
    (this module, pallas_multisweep, pallas_chain).
    """
    if offset == 0:
        return arr
    k = offset % size
    lo = jax.lax.slice_in_dim(arr, k, size, axis=d)
    hi = jax.lax.slice_in_dim(arr, 0, k, axis=d)
    return jnp.concatenate([lo, hi], axis=d)


_wrap_shift = wrap_shift  # backward-compat alias


def _execute(op: Operation, operand_arrays, *, interpret: bool):
    out_type: TempType = op.results[0].type
    n_in = op.attrs.get("num_inputs", len(op.operands))
    inputs = operand_arrays[:n_in]
    scalars = operand_arrays[n_in:]
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = outer.rank
    shape = outer.shape
    dtype = jnp.dtype(out_type.element)

    sshape: StencilShape = op.attrs.get("shape") or StencilShape(())
    halo = sshape.halo() if sshape.offsets else tuple((0, 0) for _ in range(rank))
    h0 = max(halo[0]) if halo else 0

    # Three copies (previous/current/next slab blocks) cover any dim-0 halo
    # up to one slab: the extended slab is [prev[-h0:], cur, next[:h0]].
    n_copies = 3 if h0 > 0 else 1
    row_bytes = math.prod(shape[1:]) * dtype.itemsize
    slab = _pick_slab(shape[0], row_bytes, n_copies * max(n_in, 1))
    grid = (pl.cdiv(shape[0], slab),)
    n_slabs = grid[0]
    if h0 > slab:
        # halo exceeds a slab: neighbors beyond prev/next are unreachable
        return jnp_backend.execute_apply(op, operand_arrays)

    body = op.region(0)
    n_results = len(op.results)
    full_domain = bounds == outer
    periodic = bool(op.attrs.get("periodic"))

    def kernel(*refs):
        # refs: [n_in * n_copies slab inputs] + [scalars (SMEM)] + [outs]
        in_refs = refs[: n_in * n_copies]
        scalar_refs = refs[n_in * n_copies : n_in * n_copies + len(scalars)]
        out_refs = refs[n_in * n_copies + len(scalars) :]

        pid = pl.program_id(0)

        # halo-extended slab per input: ext[k] has shape (slab + 2*h0, *trail),
        # assembled from the previous/current/next slab blocks
        ext_cache: dict[int, jnp.ndarray] = {}

        def ext(k):
            if k not in ext_cache:
                if h0 == 0:
                    ext_cache[k] = in_refs[k * n_copies][...]
                else:
                    prev = in_refs[k * n_copies + 0][...]
                    cur = in_refs[k * n_copies + 1][...]
                    nxt = in_refs[k * n_copies + 2][...]
                    ext_cache[k] = jnp.concatenate(
                        [prev[slab - h0 :], cur, nxt[:h0]], axis=0
                    )
            return ext_cache[k]

        def access_fn(k, offset):
            o0 = offset[0]
            e = ext(k)
            sl = jax.lax.slice_in_dim(e, h0 + o0, h0 + o0 + slab, axis=0)
            for d in range(1, rank):
                sl = _wrap_shift(sl, d, offset[d], shape[d])
            return sl

        def index_fn(d):
            if d == 0:
                base = pid * slab + outer.lb[0]
                iv = jax.lax.broadcasted_iota(jnp.int32, (slab,) + shape[1:], 0)
                return iv + base
            iv = jax.lax.broadcasted_iota(jnp.int32, (slab,) + shape[1:], d)
            return iv + outer.lb[d]

        scalar_vals = [r[0, 0] for r in scalar_refs]
        yields = jnp_backend.eval_scalar_dag(
            body, rank, n_in, access_fn, index_fn, scalar_vals, pinned=False
        )

        if full_domain:
            mask = None
        else:
            # in-kernel interior mask from logical coordinates
            mask = None
            for d in range(rank):
                iv = index_fn(d)
                m = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                mask = m if mask is None else (mask & m)

        for j in range(n_results):
            val = jnp.asarray(yields[j], dtype)
            val = jnp.broadcast_to(val, (slab,) + shape[1:])
            if mask is None:
                out_refs[j][...] = val
            else:
                if j < n_in:
                    center = 1 if h0 > 0 else 0
                    seed = in_refs[j * n_copies + center][...]  # current slab
                else:
                    seed = jnp.zeros((slab,) + shape[1:], dtype)
                out_refs[j][...] = jnp.where(mask, val, seed)

    # --- block specs -------------------------------------------------------
    copy_offsets = (-1, 0, 1) if n_copies == 3 else (0,)
    in_specs = []
    for k in range(n_in):
        for d in copy_offsets:

            def index_map(i, d=d):
                # keep EVERY block index i32 (including the constant trailing
                # zeros): under jax_enable_x64 promoted i64 indices break
                # Mosaic (convert recursion / unlegalizable func.return)
                i = jnp.asarray(i, jnp.int32)
                if periodic:
                    # torus domain: neighbor slabs wrap around
                    i0 = (i + jnp.int32(d)) % jnp.int32(n_slabs)
                else:
                    i0 = jnp.clip(
                        i + jnp.int32(d), jnp.int32(0), jnp.int32(n_slabs - 1)
                    )
                return (i0,) + (jnp.int32(0),) * (rank - 1)

            in_specs.append(
                pl.BlockSpec(
                    (slab,) + shape[1:], index_map, memory_space=pltpu.VMEM
                )
            )
    for _ in scalars:
        in_specs.append(
            pl.BlockSpec(
                (1, 1),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            )
        )
    out_specs = [
        pl.BlockSpec(
            (slab,) + shape[1:],
            lambda i: (jnp.asarray(i, jnp.int32),) + (jnp.int32(0),) * (rank - 1),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_results)
    ]

    n_offsets = len(set(sshape.offsets)) or 1
    cost = pl.CostEstimate(
        flops=2 * n_offsets * math.prod(shape) * max(n_in, 1),
        bytes_accessed=(n_in + n_results) * math.prod(shape) * dtype.itemsize,
        transcendentals=0,
    )

    scalar_args = [jnp.asarray(s).reshape(1, 1) for s in scalars]
    call_inputs = []
    for k in range(n_in):
        arr = jnp.asarray(inputs[k], dtype)
        call_inputs.extend([arr] * n_copies)
    call_inputs.extend(scalar_args)

    out_shape = [
        jax.ShapeDtypeStruct(shape, jnp.dtype(r.type.element)) for r in op.results
    ]

    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if n_results > 1 else out_specs[0],
        out_shape=out_shape if n_results > 1 else out_shape[0],
        cost_estimate=cost,
        interpret=interpret,
    )(*call_inputs)
    return result



# ---------------------------------------------------------------------------
# rolling-window DMA kernel: inputs stay in HBM; each grid step DMAs one
# halo-extended window into a double-buffered VMEM scratch (overlapping the
# next window's fetch with compute), so every input row crosses HBM once
# (+2h/S overlap) instead of (2h+1) times as in the multi-copy path.
# ---------------------------------------------------------------------------


def _pick_slab_collapsed(extent0: int, row_bytes: int, n_in: int,
                         n_results: int, h0p: int, al: int,
                         budget: int = 24 * 1024 * 1024) -> Optional[int]:
    """Largest slab (multiple of al, divisor of extent0, >= h0p) whose
    double-buffered windows + out blocks fit the raised scoped-vmem budget,
    capped near a ~4MB out block — bigger slabs measure slower (less
    pipeline overlap: 16/32/64-plane slabs at 256^3 gave 83/75/69 Gcell/s),
    smaller ones pay more window-halo re-reads."""
    target = max(h0p, al, (4 * 1024 * 1024 // max(row_bytes, 1)))
    s = (min(extent0, target) // al) * al
    for cand in range(s, al - 1, -al):
        if extent0 % cand or cand < h0p or cand + 2 * h0p > extent0:
            continue
        ws = (2 * n_in * (cand + 2 * h0p) + n_results * cand) * row_bytes
        if ws <= budget:
            return cand
    return None


def _execute_dma(
    op: Operation, operand_arrays, *, interpret: bool, global_start=None
):
    """Route to the rank-specific rolling-window kernel.

    Both ranks use the same RING HEAD-COPY window scheme (round 4): the
    HBM fetch brings only each window's new rows, the 2*h0p overlap rows
    ride a VMEM->VMEM copy of the previous window's tail, and every scratch
    offset is identical on every step — no halo re-read from HBM, no edge
    clamping, no realignment rotate. The ranks differ only in alignment:
    - rank 3 windows along dim 0, which Mosaic leaves UNTILED — the halo
      pad is exactly the stencil halo (h0p = h0) and dim-0 accesses are
      free ref slices.
    - rank 2 windows live on the TILED sublane dim — h0p pads to the
      sublane tile (8 rows f32 / 16 bf16) so every DMA offset stays
      tile-aligned (the round-3 clamp+pltpu.roll realignment this replaces
      paid a whole-window dynamic rotate on every step).

    global_start=None: static coordinate bases (whole-grid). Otherwise a
    sequence of traced int32 global logical coordinates of local row 0 per
    dim (the shard_map case): coordinates ride SMEM scalars, the interior
    mask is built from the traced starts, and the grid shape is the local
    block's (stale block-edge rows are garbage the caller's band fixups
    recompute — same contract as `execute_apply_window`).
    """
    if op.results[0].type.bounds.rank == 3:
        return _execute_dma_rank3(
            op, operand_arrays, interpret=interpret, global_start=global_start
        )
    return _execute_dma_rank2(
        op, operand_arrays, interpret=interpret, global_start=global_start
    )


def _ring_window_io(
    i,
    hbm_refs,
    scratches,
    sems,
    *,
    n_in: int,
    slab: int,
    h0p: int,
    win: int,
    n_slabs: int,
    N: int,
    al: int,
    periodic: bool,
):
    """All window DMA traffic for grid step `i` of a ring head-copy kernel.

    Invariant: scratch row (h0p + r) of slot i%2 holds global row
    (i*slab + r). Each step's HBM fetch brings only the NEW rows
    [i*slab + h0p, i*slab + slab + h0p); the 2*h0p head rows ride a
    VMEM->VMEM copy of the previous window's tail (issued by step i-1
    after ITS fetch completed). At the array edges the sticking-out rows
    are either wrapped torus rows (periodic=True: two extra edge DMAs from
    the far end of the array) or left stale (periodic=False: they alias
    out-of-domain reads that the copy-through mask discards).

    Semaphore layout sems[k, slot, j]: j=0 main fetch, j=1 head
    (VMEM copy, or the step-0 periodic head wrap), j=2 periodic tail wrap.

    On return, slot i%2 holds the complete window; the next window's fetch
    and head copy are in flight.
    """
    if h0p == 0:
        def fetch(step, slot):
            for k in range(n_in):
                pltpu.make_async_copy(
                    hbm_refs[k].at[pl.ds(pl.multiple_of(step * slab, al), win)],
                    scratches[k].at[slot],
                    sems.at[k, slot, 0],
                ).start()

        @pl.when(i == 0)
        def _():
            fetch(jnp.int32(0), 0)

        @pl.when(i + 1 < n_slabs)
        def _():
            fetch(i + 1, (i + 1) % 2)

        for k in range(n_in):
            pltpu.make_async_copy(
                hbm_refs[k].at[pl.ds(0, win)],
                scratches[k].at[i % 2],
                sems.at[k, i % 2, 0],
            ).wait()
        return

    def start_fetch(step, slot):
        first = step == 0
        last = step == n_slabs - 1

        @pl.when(first)
        def _():
            # head-inclusive: no previous window to copy from
            for k in range(n_in):
                pltpu.make_async_copy(
                    hbm_refs[k].at[pl.ds(0, slab + h0p)],
                    scratches[k].at[slot].at[pl.ds(h0p, slab + h0p)],
                    sems.at[k, slot, 0],
                ).start()
            if periodic:
                # torus head: global rows [-h0p, 0) = [N-h0p, N)
                for k in range(n_in):
                    pltpu.make_async_copy(
                        hbm_refs[k].at[pl.ds(N - h0p, h0p)],
                        scratches[k].at[slot].at[pl.ds(0, h0p)],
                        sems.at[k, slot, 1],
                    ).start()

        if slab > h0p:  # slab == h0p: the last window has no new rows

            @pl.when(last & jnp.logical_not(first))
            def _():
                # tail rows [N, N+h0p) don't exist: fetch stops at N
                for k in range(n_in):
                    start = pl.multiple_of(step * slab + h0p, al)
                    pltpu.make_async_copy(
                        hbm_refs[k].at[pl.ds(start, slab - h0p)],
                        scratches[k].at[slot].at[pl.ds(2 * h0p, slab - h0p)],
                        sems.at[k, slot, 0],
                    ).start()

        if periodic:

            @pl.when(last & jnp.logical_not(first))
            def _():
                # torus tail: global rows [N, N+h0p) = [0, h0p)
                for k in range(n_in):
                    pltpu.make_async_copy(
                        hbm_refs[k].at[pl.ds(0, h0p)],
                        scratches[k].at[slot].at[pl.ds(slab + h0p, h0p)],
                        sems.at[k, slot, 2],
                    ).start()

        @pl.when(jnp.logical_not(first) & jnp.logical_not(last))
        def _():
            for k in range(n_in):
                start = pl.multiple_of(step * slab + h0p, al)
                pltpu.make_async_copy(
                    hbm_refs[k].at[pl.ds(start, slab)],
                    scratches[k].at[slot].at[pl.ds(2 * h0p, slab)],
                    sems.at[k, slot, 0],
                ).start()

    def wait_fetch(step, slot):
        # the wait descriptor must match the byte count of the copy that
        # step `step` started into `slot`
        def wait_rows(rows, j=0):
            for k in range(n_in):
                pltpu.make_async_copy(
                    hbm_refs[k].at[pl.ds(0, rows)],
                    scratches[k].at[slot].at[pl.ds(0, rows)],
                    sems.at[k, slot, j],
                ).wait()

        @pl.when(step == 0)
        def _():
            wait_rows(slab + h0p)
            if periodic:
                wait_rows(h0p, 1)

        if slab > h0p:

            @pl.when((step == n_slabs - 1) & (step != 0))
            def _():
                wait_rows(slab - h0p)

        if periodic:

            @pl.when((step == n_slabs - 1) & (step != 0))
            def _():
                wait_rows(h0p, 2)

        @pl.when((step != 0) & (step != n_slabs - 1))
        def _():
            wait_rows(slab)

    def start_head_copy(slot_from, slot_to):
        # previous window's last 2*h0p rows = next window's head
        for k in range(n_in):
            pltpu.make_async_copy(
                scratches[k].at[slot_from].at[pl.ds(slab, 2 * h0p)],
                scratches[k].at[slot_to].at[pl.ds(0, 2 * h0p)],
                sems.at[k, slot_to, 1],
            ).start()

    def wait_head_copy(slot):
        for k in range(n_in):
            pltpu.make_async_copy(
                scratches[k].at[slot].at[pl.ds(0, 2 * h0p)],
                scratches[k].at[slot].at[pl.ds(0, 2 * h0p)],
                sems.at[k, slot, 1],
            ).wait()

    # warm-up: first step fetches its own window
    @pl.when(i == 0)
    def _():
        start_fetch(jnp.int32(0), 0)

    # prefetch the next window's NEW rows into the other slot
    @pl.when(i + 1 < n_slabs)
    def _():
        start_fetch(i + 1, (i + 1) % 2)

    wait_fetch(i, i % 2)

    # this window's head rode a local copy issued by the previous step
    # (after ITS fetch completed, so the source rows were ready)
    @pl.when(i >= 1)
    def _():
        wait_head_copy(i % 2)

    # now that rows [slab, win) of this slot are complete, they can seed
    # the NEXT window's head (overlaps with the compute that follows)
    @pl.when(i + 1 < n_slabs)
    def _():
        start_head_copy(i % 2, (i + 1) % 2)


def _execute_dma_rank3(
    op: Operation, operand_arrays, *, interpret: bool, global_start=None
):
    out_type: TempType = op.results[0].type
    n_in = op.attrs.get("num_inputs", len(op.operands))
    inputs = operand_arrays[:n_in]
    scalars = operand_arrays[n_in:]
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = outer.rank
    # traced-start (shard_map) calls run over the LOCAL block's shape; the
    # whole-grid path keeps the declared outer shape (identical to the
    # input's — `supported` enforced it)
    shape = outer.shape if global_start is None else tuple(inputs[0].shape)
    dtype = jnp.dtype(out_type.element)

    sshape: StencilShape = op.attrs.get("shape") or StencilShape(())

    # Rank 3 keeps its natural (dim0, sublane=dim1, lane=dim2) layout and
    # windows along dim 0, which Mosaic leaves UNTILED: window starts and
    # dim-0 access slices need no sublane alignment, so the halo pad is
    # exactly the stencil halo (h0p = h0, e.g. 1 plane for a 7-pt) and the
    # rolling window reads each plane ~(1 + 2*h0/slab)x — vs 3x for the
    # multi-copy path whose (N1,N2)-plane rows force tiny slabs, and vs a
    # dims-0-1-collapsed rank-2 window whose j+-1 accesses land on
    # misaligned sublanes (measured: native 95 / collapsed 72 / multi-copy
    # 71 Gcell/s on the 256^3 7-pt sweep).
    h0 = max(sshape.halo()[0])
    kshape = shape
    al = 1  # dim 0 is untiled — any window start/halo is legal
    h0p = h0
    krank = len(kshape)

    row_bytes = math.prod(kshape[1:]) * dtype.itemsize
    slab = _pick_slab_collapsed(
        kshape[0], row_bytes, n_in, len(op.results), h0p, al,
        budget=40 * 1024 * 1024,
    )
    if slab is None:
        raise NotImplementedError("no feasible slab for rank-3 window")
    if kshape[0] % slab != 0:
        raise NotImplementedError("dma kernel requires dim0 divisible by slab")
    if h0p > slab:
        # the ring head-copy sources each window's head from the previous
        # window's tail, which requires the previous window to reach back
        # at least 2*h0p rows: slab >= h0p
        raise NotImplementedError("dim-0 halo exceeds the slab height")
    n_slabs = kshape[0] // slab
    win = slab + 2 * h0p
    if win > kshape[0]:
        raise NotImplementedError("window exceeds array extent")

    body = op.region(0)
    n_results = len(op.results)
    full_domain = bounds == outer
    # traced-start (sharded local) windows keep the bounded-garbage edge
    # contract: the caller's band fixups recompute block edges either way
    periodic = bool(op.attrs.get("periodic")) and global_start is None
    n_start = 0 if global_start is None else rank

    # The copy-through mask is separable: an in-kernel per-cell rebuild
    # (3 iotas + 6 compares per step) measured ~10% of the whole sweep.
    # Instead, the trailing-dims (sublane/lane) interior mask is precomputed
    # ONCE — on host for static coordinates, as a tiny traced jnp array
    # outside the kernel for the shard_map case — and fetched by the
    # pipeline (constant block index -> one fetch for the whole grid). The
    # dim-0 mask — a scalar range test per slab — is pl.when-gated so only
    # the first/last slabs that actually intersect the dim-0 boundary pay.
    mask_trail = None
    lb0p = ub0p = 0
    if not full_domain:
        if global_start is None:
            import numpy as _np

            mt = _np.ones(kshape[1:], _np.int32)
            for d in range(1, rank):
                idx = _np.arange(kshape[d]) + outer.lb[d]
                md = (idx >= bounds.lb[d]) & (idx < bounds.ub[d])
                mt *= md.astype(_np.int32).reshape(
                    (1,) * (d - 1) + (-1,) + (1,) * (rank - 1 - d)
                )
            mask_trail = jnp.asarray(mt)
            lb0p = bounds.lb[0] - outer.lb[0]
            ub0p = bounds.ub[0] - outer.lb[0]
        else:
            mt = None
            for d in range(1, rank):
                idx = (
                    jnp.arange(kshape[d], dtype=jnp.int32)
                    + jnp.asarray(global_start[d], jnp.int32)
                )
                md = (idx >= bounds.lb[d]) & (idx < bounds.ub[d])
                md = md.astype(jnp.int32).reshape(
                    (1,) * (d - 1) + (-1,) + (1,) * (rank - 1 - d)
                )
                mt = md if mt is None else mt * md
            mask_trail = jnp.broadcast_to(mt, kshape[1:])
    n_mask = 0 if mask_trail is None else 1

    def kernel(*refs):
        hbm_refs = refs[:n_in]
        start_refs = refs[n_in : n_in + n_start]
        base = n_in + n_start
        scalar_refs = refs[base : base + len(scalars)]
        mask_ref = refs[base + len(scalars)] if n_mask else None
        out_refs = refs[
            base + len(scalars) + n_mask : base + len(scalars) + n_mask + n_results
        ]
        scratches = refs[base + len(scalars) + n_mask + n_results : -1]
        sems = refs[-1]  # DMA semaphores, shape (n_in, 2)

        i = pl.program_id(0)

        _ring_window_io(
            i, hbm_refs, scratches, sems,
            n_in=n_in, slab=slab, h0p=h0p, win=win, n_slabs=n_slabs,
            N=kshape[0], al=al, periodic=periodic,
        )

        slot = i % 2

        def base_of(d):
            if global_start is None:
                return jnp.int32(outer.lb[d])
            return start_refs[d][0, 0]

        # Cache the dim-0 window slices by (input, o0): a 7-pt reads the
        # center slice for 5 of its 7 accesses, and Mosaic does not CSE
        # repeated ref loads — re-slicing per access re-reads the 4MB slab
        # from VMEM each time (measured 83 -> 94.6 Gcell/s on the 256^3
        # 7-pt sweep when the rolls derive from one cached load).
        slice_cache = {}

        def dim0_slice(k, o0):
            key = (k, o0)
            if key not in slice_cache:
                slice_cache[key] = scratches[k][slot, pl.ds(h0p + o0, slab)]
            return slice_cache[key]

        def access_fn(k, offset):
            # dim 0 is the UNTILED window dim: any o0 start is legal and
            # the ref slice is free, while value-slicing a whole window
            # would materialize a VMEM copy per access
            sl = dim0_slice(k, offset[0])
            for d in range(1, krank):
                sl = _wrap_shift(sl, d, offset[d], kshape[d])
            return sl

        def index_fn(d):
            blk = (slab,) + kshape[1:]
            iv = jax.lax.broadcasted_iota(jnp.int32, blk, d)
            if d == 0:
                return iv + i * slab + base_of(0)
            return iv + base_of(d)

        scalar_vals = [r[0, 0] for r in scalar_refs]
        yields = jnp_backend.eval_scalar_dag(
            body, rank, n_in, access_fn, index_fn, scalar_vals, pinned=False
        )

        blk = (slab,) + kshape[1:]
        vals, seeds = [], []
        for j in range(n_results):
            vals.append(jnp.broadcast_to(jnp.asarray(yields[j], dtype), blk))
            if mask_ref is None:
                seeds.append(None)
            elif j < n_in:
                seeds.append(dim0_slice(j, 0))
            else:
                seeds.append(jnp.zeros(blk, dtype))

        if mask_ref is None:
            for j in range(n_results):
                out_refs[j][...] = vals[j]
        else:
            m12 = jnp.broadcast_to(mask_ref[...] != 0, blk)
            if global_start is None:
                lb0 = jnp.int32(lb0p)
                ub0 = jnp.int32(ub0p)
            else:
                # bounds are static; the local block's position is traced
                lb0 = jnp.int32(bounds.lb[0]) - start_refs[0][0, 0]
                ub0 = jnp.int32(bounds.ub[0]) - start_refs[0][0, 0]
            # does this slab contain any dim-0 boundary rows?
            need0 = (i * slab < lb0) | ((i + 1) * slab > ub0)

            @pl.when(need0)
            def _():
                iv0 = jax.lax.broadcasted_iota(jnp.int32, blk, 0) + i * slab
                m = m12 & (iv0 >= lb0) & (iv0 < ub0)
                for j in range(n_results):
                    out_refs[j][...] = jnp.where(m, vals[j], seeds[j])

            @pl.when(jnp.logical_not(need0))
            def _():
                for j in range(n_results):
                    out_refs[j][...] = jnp.where(m12, vals[j], seeds[j])

    in_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)]
    for _ in range(n_start + len(scalars)):
        in_specs.append(
            pl.BlockSpec(
                (1, 1),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            )
        )
    if mask_trail is not None:
        # constant block index: the pipeline fetches the mask once
        in_specs.append(
            pl.BlockSpec(
                kshape[1:],
                lambda i: (jnp.int32(0),) * (krank - 1),
                memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec(
            (slab,) + kshape[1:],
            lambda i: (jnp.asarray(i, jnp.int32),) + (jnp.int32(0),) * (krank - 1),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_results)
    ]
    scratch_shapes = [
        pltpu.VMEM((2, win) + kshape[1:], dtype) for _ in range(n_in)
    ] + [pltpu.SemaphoreType.DMA((n_in, 2, 3))]

    scalar_args = [jnp.asarray(s).reshape(1, 1) for s in scalars]
    call_inputs = [jnp.asarray(a, dtype) for a in inputs]
    if global_start is not None:
        call_inputs.extend(
            jnp.asarray(global_start[d], jnp.int32).reshape(1, 1)
            for d in range(rank)
        )
    call_inputs.extend(scalar_args)
    if mask_trail is not None:
        call_inputs.append(mask_trail)
    out_shape = [
        jax.ShapeDtypeStruct(kshape, jnp.dtype(r.type.element))
        for r in op.results
    ]

    kwargs = {}
    if not interpret:
        # double-buffered rank-3 windows can exceed the default scoped-vmem
        # limit; v5e has headroom (the multisweep kernels use the same raise)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=in_specs,
        out_specs=out_specs if n_results > 1 else out_specs[0],
        out_shape=out_shape if n_results > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*call_inputs)


def _execute_dma_rank2(
    op: Operation, operand_arrays, *, interpret: bool, global_start=None
):
    """Rank-2 rolling window on the tiled sublane dim (ring head-copy).

    Mosaic requires sublane-tile-aligned buffer shapes and slice starts on
    the second-minor dim; the ring scheme satisfies this by construction
    (slab, h0p, and every window start are tile multiples), so edge windows
    need no realignment at all — dtype-independent (the round-3 variant
    needed a dynamic pltpu.roll, 32-bit-only, with a branched static-shift
    fallback for bf16).

    global_start: same contract as `_execute_dma_rank3` — None for the
    whole-grid path; otherwise per-dim traced int32 global coordinates of
    local row 0 (the shard_map case: coordinates ride SMEM scalars, the
    interior mask is traced, stale block-edge rows are the caller's band
    fixups' problem).
    """
    out_type: TempType = op.results[0].type
    n_in = op.attrs.get("num_inputs", len(op.operands))
    inputs = operand_arrays[:n_in]
    scalars = operand_arrays[n_in:]
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = outer.rank
    shape = outer.shape if global_start is None else tuple(inputs[0].shape)
    dtype = jnp.dtype(out_type.element)

    sshape: StencilShape = op.attrs.get("shape") or StencilShape(())
    h0 = max(sshape.halo()[0])
    # Pad the window halo up to one sublane tile each side (8 rows for
    # 32-bit data, 16 for bf16) so win = slab + 2*h0p stays aligned.
    al = 8 if dtype.itemsize == 4 else 16
    h0p = ((h0 + al - 1) // al) * al
    if h0 > al:
        raise NotImplementedError(f"dma kernel supports dim-0 halo <= {al}")

    row_bytes = math.prod(shape[1:]) * dtype.itemsize
    # ~4MB out blocks (same sweet spot as the rank-3 kernel: bigger slabs
    # amortize per-step DMA issue/mask work, smaller ones pipeline better;
    # with the ring head-copy there is no halo re-read to trade against)
    slab = _pick_slab_collapsed(
        shape[0], row_bytes, n_in, len(op.results), h0p, al,
        budget=40 * 1024 * 1024,
    )
    if slab is None:
        raise NotImplementedError("no feasible slab for rank-2 window")
    if shape[0] % slab != 0:
        raise NotImplementedError("dma kernel requires dim0 divisible by slab")
    if h0p > slab:
        raise NotImplementedError("dim-0 halo exceeds the slab height")
    n_slabs = shape[0] // slab
    win = slab + 2 * h0p
    if win > shape[0]:
        raise NotImplementedError("window exceeds array extent")

    body = op.region(0)
    n_results = len(op.results)
    full_domain = bounds == outer
    # traced-start (sharded local) windows keep the bounded-garbage edge
    # contract: the caller's band fixups recompute block edges either way
    periodic = bool(op.attrs.get("periodic")) and global_start is None
    n_start = 0 if global_start is None else rank

    # Copy-through mask, split like the rank-3 kernel: the lane-dim
    # interior mask is precomputed ONCE (host for static coordinates, a
    # tiny traced jnp array for the shard_map case) and fetched once by
    # the pipeline (an in-kernel per-step rebuild measured ~10% of the
    # rank-3 sweep); the dim-0 range test is pl.when-gated so only slabs
    # that intersect the dim-0 boundary pay for it.
    mask_trail = None
    lb0p = ub0p = 0
    if not full_domain:
        if global_start is None:
            import numpy as _np

            idx1 = _np.arange(shape[1]) + outer.lb[1]
            mt = ((idx1 >= bounds.lb[1]) & (idx1 < bounds.ub[1])).astype(
                _np.int32
            )
            mask_trail = jnp.asarray(mt.reshape(1, shape[1]))
            lb0p = bounds.lb[0] - outer.lb[0]
            ub0p = bounds.ub[0] - outer.lb[0]
        else:
            idx1 = (
                jnp.arange(shape[1], dtype=jnp.int32)
                + jnp.asarray(global_start[1], jnp.int32)
            )
            mt = ((idx1 >= bounds.lb[1]) & (idx1 < bounds.ub[1])).astype(
                jnp.int32
            )
            mask_trail = mt.reshape(1, shape[1])
    n_mask = 0 if mask_trail is None else 1

    def kernel(*refs):
        hbm_refs = refs[:n_in]
        start_refs = refs[n_in : n_in + n_start]
        base = n_in + n_start
        scalar_refs = refs[base : base + len(scalars)]
        mask_ref = refs[base + len(scalars)] if n_mask else None
        out_refs = refs[
            base + len(scalars) + n_mask : base + len(scalars) + n_mask + n_results
        ]
        scratches = refs[base + len(scalars) + n_mask + n_results : -1]
        sems = refs[-1]  # DMA semaphores, shape (n_in, 2, 2)

        i = pl.program_id(0)

        _ring_window_io(
            i, hbm_refs, scratches, sems,
            n_in=n_in, slab=slab, h0p=h0p, win=win, n_slabs=n_slabs,
            N=shape[0], al=al, periodic=periodic,
        )

        slot = i % 2
        ext_cache: dict = {}

        def ext(k):
            if k not in ext_cache:
                ext_cache[k] = scratches[k][slot]
            return ext_cache[k]

        def access_fn(k, offset):
            o0 = offset[0]
            sl = jax.lax.slice_in_dim(ext(k), h0p + o0, h0p + o0 + slab, axis=0)
            for d in range(1, rank):
                sl = _wrap_shift(sl, d, offset[d], shape[d])
            return sl

        def base_of(d):
            if global_start is None:
                return jnp.int32(outer.lb[d])
            return start_refs[d][0, 0]

        def index_fn(d):
            iv = jax.lax.broadcasted_iota(jnp.int32, (slab,) + shape[1:], d)
            if d == 0:
                return iv + i * slab + base_of(0)
            return iv + base_of(d)

        scalar_vals = [r[0, 0] for r in scalar_refs]
        yields = jnp_backend.eval_scalar_dag(
            body, rank, n_in, access_fn, index_fn, scalar_vals, pinned=False
        )

        blk = (slab,) + shape[1:]
        vals, seeds = [], []
        for j in range(n_results):
            vals.append(jnp.broadcast_to(jnp.asarray(yields[j], dtype), blk))
            if mask_ref is None:
                seeds.append(None)
            elif j < n_in:
                seeds.append(
                    jax.lax.slice_in_dim(ext(j), h0p, h0p + slab, axis=0)
                )
            else:
                seeds.append(jnp.zeros(blk, dtype))

        if mask_ref is None:
            for j in range(n_results):
                out_refs[j][...] = vals[j]
        else:
            m12 = jnp.broadcast_to(mask_ref[...] != 0, blk)
            if global_start is None:
                lb0 = jnp.int32(lb0p)
                ub0 = jnp.int32(ub0p)
            else:
                # bounds are static; the local block's position is traced
                lb0 = jnp.int32(bounds.lb[0]) - start_refs[0][0, 0]
                ub0 = jnp.int32(bounds.ub[0]) - start_refs[0][0, 0]
            # does this slab contain any dim-0 boundary rows?
            need0 = (i * slab < lb0) | ((i + 1) * slab > ub0)

            @pl.when(need0)
            def _():
                iv0 = jax.lax.broadcasted_iota(jnp.int32, blk, 0) + i * slab
                m = m12 & (iv0 >= lb0) & (iv0 < ub0)
                for j in range(n_results):
                    out_refs[j][...] = jnp.where(m, vals[j], seeds[j])

            @pl.when(jnp.logical_not(need0))
            def _():
                for j in range(n_results):
                    out_refs[j][...] = jnp.where(m12, vals[j], seeds[j])

    in_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)]
    for _ in range(n_start + len(scalars)):
        in_specs.append(
            pl.BlockSpec(
                (1, 1),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            )
        )
    if mask_trail is not None:
        # constant block index: the pipeline fetches the mask once
        in_specs.append(
            pl.BlockSpec(
                (1, shape[1]),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec(
            (slab,) + shape[1:],
            lambda i: (jnp.asarray(i, jnp.int32),) + (jnp.int32(0),) * (rank - 1),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_results)
    ]
    scratch_shapes = [
        pltpu.VMEM((2, win) + shape[1:], dtype) for _ in range(n_in)
    ] + [pltpu.SemaphoreType.DMA((n_in, 2, 3))]

    scalar_args = [jnp.asarray(s).reshape(1, 1) for s in scalars]
    call_inputs = [jnp.asarray(a, dtype) for a in inputs]
    if global_start is not None:
        call_inputs.extend(
            jnp.asarray(global_start[d], jnp.int32).reshape(1, 1)
            for d in range(rank)
        )
    call_inputs.extend(scalar_args)
    if mask_trail is not None:
        call_inputs.append(mask_trail)
    out_shape = [
        jax.ShapeDtypeStruct(shape, jnp.dtype(r.type.element)) for r in op.results
    ]

    kwargs = {}
    if not interpret:
        # the ~4MB-out-block slabs push the double-buffered windows past
        # the default scoped-vmem limit; v5e has headroom (the rank-3 and
        # multisweep kernels use the same raise)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=in_specs,
        out_specs=out_specs if n_results > 1 else out_specs[0],
        out_shape=out_shape if n_results > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*call_inputs)


# ---------------------------------------------------------------------------
# shard-local execution: run one apply on a halo-extended local block whose
# global position is only known at runtime (shard_map). Same slab-blocked
# kernel as _execute, but the domain shape is the extended block and the
# logical coordinates come from a traced per-dim global start (SMEM scalars).
# ---------------------------------------------------------------------------


def window_supported(op: Operation, ext_shape) -> bool:
    if not supported(op):
        return False
    if math.prod(ext_shape) < 64 * 128:
        return False
    # execute_apply_window raises when the dim-0 halo exceeds its slab
    # (very wide rows force _pick_slab to the 8-row floor); gate on the
    # same arithmetic so sharded callers fall back to jnp instead of
    # crashing at shard_map trace time
    out_type: TempType = op.results[0].type
    sshape: StencilShape = op.attrs.get("shape") or StencilShape(())
    rank = out_type.bounds.rank
    halo = (
        sshape.halo() if sshape.offsets else tuple((0, 0) for _ in range(rank))
    )
    h0 = max(halo[0]) if halo else 0
    if h0 > 0:
        n_in = op.attrs.get("num_inputs", len(op.operands))
        row_bytes = (
            math.prod(ext_shape[1:]) * jnp.dtype(out_type.element).itemsize
        )
        if h0 > _pick_slab(ext_shape[0], row_bytes, 3 * max(n_in, 1)):
            return False
    return True


def execute_apply_window(
    op: Operation, ext_arrays, scalars, ext_shape, global_start, *, interpret
):
    """Apply over an extended local window with traced global coordinates.

    global_start[d]: traced int32 global logical coordinate of window row 0.
    Returns arrays of ext_shape (caller carves out the interior).

    Routing: when the rolling-window DMA ring kernel pays on the LOCAL
    block's geometry (same `_dma_profitable` trade as the whole-grid path:
    wide dim-0 halos rank-2, always rank-3, lane-aligned rows), the apply
    runs there — single HBM pass per input instead of the multi-copy
    BlockSpec pipeline's (2h+1)x dim-0 read amplification. Both kernels
    share the block-edge contract (stale/clamped edge rows are the caller's
    band fixups' problem), so the routing is invisible to callers.
    """
    if _dma_profitable(op, tuple(ext_shape)):
        try:
            return _execute_dma(
                op,
                tuple(ext_arrays) + tuple(scalars),
                interpret=interpret,
                global_start=global_start,
            )
        except NotImplementedError:
            pass
    out_type: TempType = op.results[0].type
    n_in = op.attrs.get("num_inputs", len(op.operands))
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = outer.rank
    shape = tuple(ext_shape)
    dtype = jnp.dtype(out_type.element)

    sshape: StencilShape = op.attrs.get("shape") or StencilShape(())
    halo = sshape.halo() if sshape.offsets else tuple((0, 0) for _ in range(rank))
    h0 = max(halo[0]) if halo else 0

    n_copies = 3 if h0 > 0 else 1
    row_bytes = math.prod(shape[1:]) * dtype.itemsize
    slab = _pick_slab(shape[0], row_bytes, n_copies * max(n_in, 1))
    grid = (pl.cdiv(shape[0], slab),)
    n_slabs = grid[0]
    if h0 > slab:
        raise NotImplementedError("window halo exceeds slab")

    body = op.region(0)
    n_results = len(op.results)
    full_domain = bounds == outer
    n_scalars = len(scalars)

    def kernel(*refs):
        in_refs = refs[: n_in * n_copies]
        start_refs = refs[n_in * n_copies : n_in * n_copies + rank]
        scalar_refs = refs[
            n_in * n_copies + rank : n_in * n_copies + rank + n_scalars
        ]
        out_refs = refs[n_in * n_copies + rank + n_scalars :]

        pid = pl.program_id(0)

        ext_cache: dict[int, jnp.ndarray] = {}

        def ext(k):
            if k not in ext_cache:
                if h0 == 0:
                    ext_cache[k] = in_refs[k * n_copies][...]
                else:
                    prev = in_refs[k * n_copies + 0][...]
                    cur = in_refs[k * n_copies + 1][...]
                    nxt = in_refs[k * n_copies + 2][...]
                    ext_cache[k] = jnp.concatenate(
                        [prev[slab - h0 :], cur, nxt[:h0]], axis=0
                    )
            return ext_cache[k]

        def access_fn(k, offset):
            sl = jax.lax.slice_in_dim(
                ext(k), h0 + offset[0], h0 + offset[0] + slab, axis=0
            )
            for d in range(1, rank):
                sl = _wrap_shift(sl, d, offset[d], shape[d])
            return sl

        def index_fn(d):
            iv = jax.lax.broadcasted_iota(jnp.int32, (slab,) + shape[1:], d)
            if d == 0:
                return iv + pid * slab + start_refs[0][0, 0]
            return iv + start_refs[d][0, 0]

        scalar_vals = [r[0, 0] for r in scalar_refs]
        yields = jnp_backend.eval_scalar_dag(
            body, rank, n_in, access_fn, index_fn, scalar_vals, pinned=False
        )

        mask = None
        if not full_domain:
            for d in range(rank):
                iv = index_fn(d)
                m = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                mask = m if mask is None else (mask & m)

        for j in range(n_results):
            val = jnp.broadcast_to(
                jnp.asarray(yields[j], dtype), (slab,) + shape[1:]
            )
            if mask is None:
                out_refs[j][...] = val
            else:
                center = 1 if h0 > 0 else 0
                seed = (
                    in_refs[j * n_copies + center][...]
                    if j < n_in
                    else jnp.zeros((slab,) + shape[1:], dtype)
                )
                out_refs[j][...] = jnp.where(mask, val, seed)

    copy_offsets = (-1, 0, 1) if n_copies == 3 else (0,)
    in_specs = []
    for k in range(n_in):
        for d in copy_offsets:

            def index_map(i, d=d):
                i = jnp.asarray(i, jnp.int32)
                i0 = jnp.clip(
                    i + jnp.int32(d), jnp.int32(0), jnp.int32(n_slabs - 1)
                )
                return (i0,) + (jnp.int32(0),) * (rank - 1)

            in_specs.append(
                pl.BlockSpec((slab,) + shape[1:], index_map, memory_space=pltpu.VMEM)
            )
    for _ in range(rank + n_scalars):
        in_specs.append(
            pl.BlockSpec(
                (1, 1),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            )
        )
    out_specs = [
        pl.BlockSpec(
            (slab,) + shape[1:],
            lambda i: (jnp.asarray(i, jnp.int32),) + (jnp.int32(0),) * (rank - 1),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_results)
    ]

    call_inputs = []
    for k in range(n_in):
        call_inputs.extend([jnp.asarray(ext_arrays[k], dtype)] * n_copies)
    for d in range(rank):
        call_inputs.append(
            jnp.asarray(global_start[d], jnp.int32).reshape(1, 1)
        )
    call_inputs.extend(jnp.asarray(s).reshape(1, 1) for s in scalars)

    # the n_copies block fetches alias one HBM buffer: report the true
    # (deduped) traffic so the pipeliner overlaps fetches instead of
    # serializing for the naive 4x estimate (measured 45 -> 90 Gcell/s on
    # the 4096^2 5-pt core sweep — the same estimate _execute passes)
    n_offsets = len(set(sshape.offsets)) or 1
    cost = pl.CostEstimate(
        flops=2 * n_offsets * math.prod(shape) * max(n_in, 1),
        bytes_accessed=(n_in + n_results) * math.prod(shape) * dtype.itemsize,
        transcendentals=0,
    )

    out_shape = [jax.ShapeDtypeStruct(shape, dtype) for _ in range(n_results)]
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if n_results > 1 else out_specs[0],
        out_shape=out_shape if n_results > 1 else out_shape[0],
        cost_estimate=cost,
        interpret=interpret,
    )(*call_inputs)
    return result
