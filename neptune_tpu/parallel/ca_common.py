"""Shared per-shard machinery for the s-step CA-Krylov solvers.

`ca_cg`, `ca_gmres`, and `ca_bicgstab` all run the same choreography per
outer block: exchange K-deep strips of their carried fields ONCE, build
basis chains with the matrix-powers kernel (zero-ghost on the core,
trapezoid band replay at the edges — the machinery of `sharded_apply`),
reduce ONE Gram matrix, and iterate in replicated coefficient space. This
module holds the solver-independent parts so the choreography exists in
exactly one place:

  * the split-preconditioned operator Ã = S A S (S = sqrt(inv_diag)),
  * monomial/chebyshev basis chains,
  * `basis_with_replay`: strip exchange + core chains + band replays for
    any (carried fields, chain lengths) combination — CG/BiCGStab pass
    [x, p] with a p-chain + r-chain, GMRES passes [x] with one r-chain;
    the r-chain is always seeded from the TRUE residual b̃ - Ã x
    (residual replacement),
  * `true_rr`: the honest final-report matvec (one extra exchange), and
  * `gsum`: psum over exactly the mesh axes that shard the field.

`ca_chebyshev` keeps its own body: it replays a three-field recurrence,
not seed chains.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .sharded_apply import (
    _gstart,
    _run_band_fixups,
    _stitch_band,
    _strip_exchange,
)


class MatrixPowers:
    """Per-shard state + operations for one CA solve (built inside the
    shard_map local function; all members are traced values)."""

    def __init__(
        self,
        *,
        matvec_block,
        names,
        rank,
        outer,
        dtype,
        periodic,
        basis,
        theta,
        delta,
        need_k,
        bl,
        sl,
    ):
        self.matvec_block = matvec_block
        self.names = names
        self.rank = rank
        self.dtype = dtype
        self.periodic = periodic
        self.basis = basis
        self.theta = theta
        self.delta = delta
        self.need_k = need_k
        self.nloc = bl.shape
        self.gstart = _gstart(self.nloc, rank, names, outer)
        # split-preconditioner S and b̃ = S b; their strips are
        # iteration-constant: exchanged ONCE here, outside any solver loop
        # (XLA cannot hoist collectives out of a while_loop body)
        self.S_loc = None if sl is None else jnp.sqrt(sl.astype(dtype))
        self.btl = (
            bl.astype(dtype) if self.S_loc is None else self.S_loc * bl
        )
        cfields = (
            [self.btl] if self.S_loc is None else [self.btl, self.S_loc]
        )
        self.c_strips, self.c_ext, _ = _strip_exchange(
            cfields, self.nloc, rank, names, need_k, periodic
        )

    # ---- operator and chains -------------------------------------------
    def Amv(self, v, S_blk, bases, shape):
        """Ã v = S * A(S * v) (S=None: plain A)."""
        u = v if S_blk is None else S_blk * v
        w = self.matvec_block(u, bases, shape)
        return w if S_blk is None else S_blk * w

    def chain(self, seed, length, S_blk, bases, shape):
        """[v, Ãv, ...] (monomial) or the shifted Chebyshev chain."""
        vs = [seed]
        for j in range(length - 1):
            Av = self.Amv(vs[-1], S_blk, bases, shape)
            if self.basis == "monomial":
                vs.append(Av)
            elif j == 0:
                vs.append((Av - self.theta * vs[-1]) / self.delta)
            else:
                vs.append(
                    2.0 * (Av - self.theta * vs[-1]) / self.delta - vs[-2]
                )
        return vs

    def _band_consts(self, zone):
        """Stitched (b̃, S) bands for a replay zone."""
        bbt = _stitch_band(
            self.c_ext, self.c_strips, 0, zone.d, zone.side, zone.lo_n,
            zone.hi_n, self.nloc,
        ).astype(self.dtype)
        bS = (
            _stitch_band(
                self.c_ext, self.c_strips, 1, zone.d, zone.side,
                zone.lo_n, zone.hi_n, self.nloc,
            ).astype(self.dtype)
            if self.S_loc is not None
            else None
        )
        return bbt, bS

    def basis_with_replay(self, fields, lengths):
        """The matrix-powers kernel: ONE strip exchange of `fields`
        (fields[0] must be x), core chains, trapezoid band replays.

        lengths = (len_seed1, ..., len_r): one chain per carried seed
        field fields[1:], in order, followed by the r-chain seeded from
        the TRUE residual b̃ - Ã·fields[0]. Returns the 'sum(lengths)'
        basis vectors, boundary-exact.
        """

        def chains_on(blk_fields, bbt, bS, bases, shape):
            out = []
            for seed, L in zip(blk_fields[1:], lengths[:-1]):
                out += self.chain(seed, L, bS, bases, shape)
            r0 = bbt - self.Amv(blk_fields[0], bS, bases, shape)
            out += self.chain(r0, lengths[-1], bS, bases, shape)
            return out

        strips, ext_slice, sharded_dims = _strip_exchange(
            fields, self.nloc, self.rank, self.names, self.need_k,
            self.periodic,
        )
        V = chains_on(
            fields, self.btl, self.S_loc, self.gstart, self.nloc
        )

        def replay(bands, zone):
            bf = [bb.astype(self.dtype) for bb in bands]
            bbt, bS = self._band_consts(zone)
            return chains_on(bf, bbt, bS, zone.bases, bf[0].shape)

        return _run_band_fixups(
            V, len(fields), strips, ext_slice, sharded_dims, self.need_k,
            self.nloc, self.rank, self.gstart, replay,
        )

    # ---- reductions and honest reporting --------------------------------
    def gsum(self, v):
        """psum over exactly the axes that shard this field (extra mesh
        axes hold replicas; summing them would inflate the norms)."""
        for nm in self.names[: self.rank]:
            if nm:
                v = lax.psum(v, nm)
        return v

    def true_rr(self, x):
        """||b̃ - Ã x||² with a fresh exchange + band fixup — the honest
        final report (coefficient-space estimates bottom out at
        ~sqrt(eps); see the solver docstrings)."""
        ts, te, td = _strip_exchange(
            [x], self.nloc, self.rank, self.names, self.need_k,
            self.periodic,
        )
        r_main = self.btl - self.Amv(x, self.S_loc, self.gstart, self.nloc)

        def rreplay(bands, zone):
            (bx,) = (bb.astype(self.dtype) for bb in bands)
            bbt, bS = self._band_consts(zone)
            return [bbt - self.Amv(bx, bS, zone.bases, bx.shape)]

        (rf,) = _run_band_fixups(
            [r_main], 1, ts, te, td, self.need_k, self.nloc, self.rank,
            self.gstart, rreplay,
        )
        return self.gsum(jnp.sum(rf * rf))
