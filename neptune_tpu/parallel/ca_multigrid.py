"""Communication-avoiding multigrid smoothing: k Chebyshev smoothing
iterations per halo exchange on every V-cycle level.

The distributed V-cycle's smoothers are its communication hot spot: a
V(k,k) cycle over naive sharded matvecs pays 2k+1 exchange rounds per
level per cycle (k pre-sweeps, the residual matvec, k post-sweeps), and
the rounds shrink with the level — coarse grids are pure latency. This
module runs each smoothing pass through the overlapping-trapezoid scheme
of `ca_chebyshev`: exchange k-deep (x, r) strips ONCE, run k fused
zero-ghost Chebyshev iterations on the core, and recompute the k·reach
edge zones exactly by replaying the same k iterations on strip-stitched
bands. Per level per cycle that is

    pre-smooth (zero guess)   1 round   (vs k)
    post-smooth               2 rounds  (vs k+1: residual + sweeps)

i.e. 3 exchange rounds instead of 2k+1, with the pre-smoother's residual
falling out of the Chebyshev recurrence for free (the restriction input
needs no extra matvec).

Smoothing math is IDENTICAL to `solvers.multigrid`'s "cheb" smoother —
degree-k Chebyshev on [lam_max/4, lam_max] of D^-1 A — so convergence is
unchanged (same trajectory to fp roundoff) and the cycle stays a fixed
linear, D-self-adjoint operator: valid as a CG preconditioner.

No reference counterpart (the reference has no distributed execution,
SURVEY.md §2.8; its PCMG lives behind single-rank PETSc,
/root/reference/lib/Runtime/PETSc/NeptunePETScRuntime.cpp:136).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from jax import shard_map

from ..ir.types import TempType
from .mesh import GridMesh
from .sharded_apply import (
    _block_apply,
    _fused_plan,
    _gstart,
    _run_band_fixups,
    _single_apply,
    _stitch_band,
    _strip_exchange,
    shardmap_opdef,
)


def ca_smoother(
    cm,
    name: str,
    gmesh: GridMesh,
    *,
    k: int,
    lam_min: float,
    lam_max: float,
    inv_diag=None,
):
    """Build the fused k-iteration Chebyshev smoother for A = @name.

    Returns (smooth, smooth_zero):
      smooth(b, x) -> (x', r')  — k Chebyshev iterations from x
                                  (2 exchange rounds: one fused sharded
                                  matvec for r = b - A x, one k-deep strip
                                  exchange for the fused iterations);
      smooth_zero(b) -> (x', r') — same from x = 0, where r0 = b needs no
                                  matvec (1 exchange round).
    r' is the exact recurrence residual b - A x' (fp roundoff) — a V-cycle
    can restrict it directly without another matvec.

    lam_min/lam_max bound the spectrum of (M A), M = diag(inv_diag) or
    identity; smoothing uses the full given interval (pass
    [lam_max/4, lam_max] for the standard smoothing range). Raises
    ValueError when @name is ineligible for the fused path at depth k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    fn = cm.module.lookup(name)
    tt: TempType = fn.ftype.inputs[0]
    rank = tt.bounds.rank
    if len(fn.ftype.inputs) != 1 or len(fn.ftype.results) != 1:
        raise ValueError("ca_smoother needs a unary, single-result opdef")
    op = _single_apply(fn)
    if op is None:
        raise ValueError("ca_smoother needs a single-apply opdef body")
    names = list(gmesh.axis_names[:rank]) + [None] * (
        rank - len(gmesh.axis_names)
    )
    plan = _fused_plan(fn, op, gmesh, names, tt, sweeps_k=k)
    if plan is None:
        raise ValueError(
            f"@{name} is not eligible at k={k} "
            "(non-constant scalars, or k*reach exceeds a shard)"
        )
    need, scalar_vals, _ret_index, _arg_order = plan
    spec = gmesh.pspec(rank)

    out_type: TempType = op.results[0].type
    outer = out_type.bounds
    dtype = jnp.dtype(out_type.element)
    periodic = bool(op.attrs.get("periodic"))

    theta = 0.5 * (float(lam_max) + float(lam_min))
    delta = 0.5 * (float(lam_max) - float(lam_min))
    sigma1 = theta / delta
    has_id = inv_diag is not None
    need_k = [(k * lo, k * hi) for lo, hi in need]

    matvec_block = _block_apply(op, names, scalar_vals)

    def k_iters(x, r, idiag, bases, shape):
        """Seed step + k-1 recurrence steps = k matvecs, the exact math of
        solvers.chebyshev at maxiter=k (restarted each smoothing pass)."""
        z = r if idiag is None else idiag * r
        d = z / theta
        x = x + d
        r = r - matvec_block(d, bases, shape)
        rho_prev = jnp.asarray(1.0 / sigma1, dtype)
        for _ in range(k - 1):
            z = r if idiag is None else idiag * r
            rho = 1.0 / (2.0 * sigma1 - rho_prev)
            d = (2.0 * rho / delta) * z + (rho * rho_prev) * d
            x = x + d
            r = r - matvec_block(d, bases, shape)
            rho_prev = rho
        return x, r

    def smooth_core(xl, rl, idl, nloc, gstart):
        """One fused smoothing pass given a locally-complete residual."""
        strips, ext_slice, sharded_dims = _strip_exchange(
            [xl, rl], nloc, rank, names, need_k, periodic
        )
        id_strips = id_ext = None
        if idl is not None:
            id_strips, id_ext, _ = _strip_exchange(
                [idl], nloc, rank, names, need_k, periodic
            )
        xm, rm = k_iters(xl, rl, idl, gstart, nloc)

        def replay(bands, zone):
            bx, br = (bb.astype(dtype) for bb in bands)
            bid = (
                _stitch_band(
                    id_ext, id_strips, 0, zone.d, zone.side, zone.lo_n,
                    zone.hi_n, nloc,
                )
                if idl is not None
                else None
            )
            fx, fr = k_iters(bx, br, bid, zone.bases, bx.shape)
            return [fx, fr]

        return _run_band_fixups(
            [xm, rm], 2, strips, ext_slice, sharded_dims,
            need_k, nloc, rank, gstart, replay,
        )

    def local_from_x(bl, xl, idl):
        nloc = bl.shape
        gstart = _gstart(nloc, rank, names, outer)
        # round 1: r = b - A x (fused sharded matvec, 1x-reach band fixup)
        strips1, ext1, dims1 = _strip_exchange(
            [xl], nloc, rank, names, need, periodic
        )
        Ax = matvec_block(xl, gstart, nloc)
        (Ax,) = _run_band_fixups(
            [Ax], 1, strips1, ext1, dims1, need, nloc, rank, gstart,
            lambda bands, zone: [
                matvec_block(bb, zone.bases, bb.shape) for bb in bands
            ],
        )
        rl = bl.astype(dtype) - Ax
        xm, rm = smooth_core(xl.astype(dtype), rl, idl, nloc, gstart)
        return xm, rm

    def local_from_zero(bl, idl):
        nloc = bl.shape
        gstart = _gstart(nloc, rank, names, outer)
        bl = bl.astype(dtype)
        xm, rm = smooth_core(jnp.zeros_like(bl), bl, idl, nloc, gstart)
        return xm, rm

    idspec = spec if has_id else gmesh.pspec(0)
    id_arg = inv_diag if has_id else jnp.zeros(())

    sm_x = shard_map(
        lambda bb, xx, ii: local_from_x(bb, xx, ii if has_id else None),
        mesh=gmesh.mesh,
        in_specs=(spec, spec, idspec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    sm_0 = shard_map(
        lambda bb, ii: local_from_zero(bb, ii if has_id else None),
        mesh=gmesh.mesh,
        in_specs=(spec, idspec),
        out_specs=(spec, spec),
        check_vma=False,
    )

    def smooth(b, x):
        return sm_x(b, x, id_arg)

    def smooth_zero(b):
        return sm_0(b, id_arg)

    return smooth, smooth_zero


def build_ca_levels(
    cm,
    names: Sequence[str],
    gmesh: GridMesh,
    like,
    *,
    k: int = 2,
    matvecs: Optional[Sequence[Callable]] = None,
):
    """MG level list with CA smoothers: finest-to-coarsest opdef names.

    Each level's matvec is the fused strip `shardmap_opdef` path; its
    ca_smooth/ca_smooth_zero run k Chebyshev smoothing iterations on
    [lam_max/4, lam_max] of D^-1 A per 1-2 exchange rounds. Levels where
    the fused plan is ineligible (k*reach exceeding a tiny coarse shard)
    fall back to the per-sweep path (ca_smooth=None) — `v_cycle` then
    smooths with its standard per-matvec "cheb" smoother there.
    """
    from ..solvers.multigrid import build_levels

    def _with_halo(mv, halo):
        """build_levels probes the operator diagonal with stencil-period
        shifts; a bare callable without `.halo` falls back to period
        (1, 1), which ALIASES taps of reach > 1 into the diagonal (wrong
        inv_diag, wrong lam_max, silently degraded smoothing). Wrap with
        the verifier's halo so probing is exact for any reach — always a
        fresh wrapper, never a mutation of the caller's callable (setting
        `.halo` on a user function would leak past this call and go stale
        if the same callable is reused for a different operator)."""

        def shim(v, _mv=mv):
            return _mv(v)

        shim.halo = halo
        return shim

    mvs = (
        list(matvecs)
        if matvecs is not None
        else [shardmap_opdef(cm, nm, gmesh) for nm in names]
    )
    mvs = [
        mv
        if getattr(mv, "halo", None)
        else _with_halo(mv, cm.module.lookup(nm).attrs["halo"])
        for mv, nm in zip(mvs, names)
    ]
    levels = build_levels(mvs, like)
    out = []
    for lvl, nm in zip(levels, names):
        lmax = float(lvl.cheb_lmax)
        try:
            sm, sm0 = ca_smoother(
                cm, nm, gmesh, k=k,
                lam_min=lmax / 4.0, lam_max=lmax, inv_diag=lvl.inv_diag,
            )
        except ValueError:
            sm = sm0 = None
        out.append(
            lvl._replace(
                ca_smooth=sm, ca_smooth_zero=sm0, ca_k=k if sm else 0
            )
        )
    return out
