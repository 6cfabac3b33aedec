"""Communication-avoiding (s-step) BiCGStab on sharded fields.

Completes the reference's KSP trio (`solve_linear` accepts
"cg"/"gmres"/"bicgstab",
/root/reference/include/Dialect/NeptuneIR/NeptuneIROps.td:646-684) in
communication-avoiding form: per outer block, ONE strip exchange builds a
two-seed Krylov basis with the matrix-powers kernel, and ONE psum of the
extended Gram matrix over W = [V, r̃0] covers every inner product of the s
iterations — the shadow dots (r̃0, r)/(r̃0, v) are rows of the Gram against
the carried shadow field, the stabilization dots (t,t)/(t,s) are
coefficient-space quadratic forms. The s BiCGStab iterations then run
replicated with no communication.

Chain depths: BiCGStab applies Ã twice per iteration (v = Ãp̂, t = Ãŝ),
and block entry must reconstruct the invariant v = Ã·p of the carried
direction (one more application), so the chains run 2s+2 (p-seed) and
2s+1 (r-seed) deep — m = 4s+3 basis vectors on a (2s+1)·reach-deep
exchange. Communication per s iterations: 1 exchange + 1 psum, vs 2s
exchanges + 4s psum rounds for per-iteration BiCGStab.

Numerics follow `ca_cg`:
  * Jacobi preconditioning as the split similarity transform Ã = S A S
    (S = sqrt(inv_diag)) — valid for any invertible A.
  * Residual replacement: every outer block reseeds the R-chain from the
    TRUE residual b̃ - Ã x (it rides the same strip exchange as p).
  * Honest reporting: convergence control rides the block-seed norm
    G[r,r]; the in-block quadratic-form estimates only gate the inner
    iterations, with guards on BiCGStab's classic breakdowns
    (rho/denom/tt ≈ 0) that restart the direction and the shadow from
    the residual; the final report spends one extra exchanged matvec so
    `info.resnorm` is the true ||b̃ - Ã x|| of the returned x.

No reference counterpart (the reference is single-process, SURVEY.md
§2.8); the algorithm family is Carson's s-step BiCGStab.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

from .ca_cg import _basis_matrix
from .ca_common import MatrixPowers, _mm, plan_ca_solver, run_ca_solver
from .mesh import GridMesh


def bicgstab_sharded(
    cm,
    name: str,
    gmesh: GridMesh,
    *,
    s: int = 2,
    maxiter: int = 200,
    tol: float = 1e-6,
    inv_diag=None,
    basis: str = "monomial",
    lam_min: Optional[float] = None,
    lam_max: Optional[float] = None,
) -> Callable:
    """Build a jittable communication-avoiding BiCGStab solve for A = @name.

    Returns solve(b) -> (x, SolveInfo). A may be nonsymmetric. inv_diag,
    if given, is the Jacobi preconditioner diagonal (positive, full-field,
    sharded like b). basis="chebyshev" requires lam_min/lam_max bounding
    the (real part of the) spectrum of Ã = S A S. Eligibility needs
    (2s+1)·reach to fit one shard — prefer small s (the default s=2
    already cuts exchange rounds ~4x and psum rounds ~8x vs per-iteration
    BiCGStab's 4 dots + 2 exchanges per iteration).
    """
    # two operator applications per iteration: the chains run 2s+1 deep
    sp = plan_ca_solver(
        cm, name, gmesh, s=s, kdepth=2 * s + 1, kdepth_desc="(2s+1)",
        solver="bicgstab_sharded", basis=basis, lam_min=lam_min,
        lam_max=lam_max,
    )
    rank, names, need, spec = sp.rank, sp.names, sp.need, sp.spec
    outer, dtype, periodic = sp.outer, sp.dtype, sp.periodic
    theta, delta, matvec_block = sp.theta, sp.delta, sp.matvec_block

    kdepth = 2 * s + 1
    len_p, len_r = 2 * s + 2, 2 * s + 1
    m = len_p + len_r  # 4s + 3
    R0 = len_p  # coefficient index of the R-chain seed (the residual)
    Bmat = _basis_matrix((len_p, len_r), basis, theta, delta, dtype)

    def global_fn(b):
        def local_fn(bl, sl):
            # shared matrix-powers machinery (one exchange per block, core
            # chains + trapezoid band replays, honest final matvec)
            mp = MatrixPowers(
                matvec_block=matvec_block, names=names, rank=rank,
                outer=outer, dtype=dtype, periodic=periodic, basis=basis,
                theta=theta, delta=delta,
                need_k=[(kdepth * lo, kdepth * hi) for lo, hi in need],
                need_1=need,
                bl=bl, sl=sl,
            )
            nloc, gsum = mp.nloc, mp.gsum

            b2 = gsum(jnp.sum(mp.btl * mp.btl))
            target2 = jnp.asarray(tol * tol, dtype) * b2
            one = jnp.asarray(1.0, dtype)

            def outer_body(carry):
                (x, p, rhat, rho, alpha, omega, rr, it, stall, fresh,
                 best_x, best_rr) = carry
                # one exchange: (2s+1)-deep strips of (x, p); basis =
                # [p, Ãp, .., Ã^{2s+1} p, r, Ãr, .., Ã^{2s} r] with the
                # TRUE residual seed r = b̃ - Ã x
                V = mp.basis_with_replay([x, p], (len_p, len_r))

                # a fresh block (solve start / post-breakdown) re-pins the
                # shadow to the block-seed residual and resets the scalars
                rhat_eff = jnp.where(fresh, V[R0], rhat)
                rho = jnp.where(fresh, one, rho)
                alpha = jnp.where(fresh, one, alpha)
                omega = jnp.where(fresh, one, omega)

                # ---- one psum: extended Gram over [V, r̃0] ----
                Ws = jnp.stack(
                    [v.reshape(-1) for v in V] + [rhat_eff.reshape(-1)]
                )
                Gx = gsum(_mm(Ws, Ws.T))
                G_raw = Gx[:m, :m]
                g_raw = Gx[m, :m]  # g[i] = (r̃0, V_i)

                # Column normalization (zero extra communication): the
                # monomial basis norms grow like lam^j over the 2s+2-deep
                # chains, so raw-Gram quadratic forms lose ~log2(kappa(V)^2)
                # bits and BiCGStab stagnates orders above tol. Work in the
                # scaled basis V' = V·diag(1/||V_j||) (norms from the Gram
                # diagonal): G' = D G D, g' = D g, B'[i,j] = B[i,j]·d_i/d_j,
                # and scaled coefficients map back by DIVIDING by the
                # column norms at recovery: c = c'/||V_j|| (the seeds below
                # carry the inverse scaling c' = ||V_j||*c).
                dG = jnp.sqrt(jnp.clip(jnp.diag(G_raw), 0.0, None))
                dsafe = jnp.where(dG > 0, dG, one)
                G = G_raw / (dsafe[:, None] * dsafe[None, :])
                g = g_raw / dsafe
                Bs = Bmat * (dsafe[:, None] / dsafe[None, :])

                # trustworthy block-seed norm: direct sum of squares of
                # the true residual field (see ca_cg for why the in-block
                # quadratic forms cannot be trusted near convergence)
                rr_seed = G_raw[R0, R0]
                # best-iterate tracking on the trusted seed (same safety
                # net as ca_cg): late-block wander past a degenerate basis
                # cannot destroy the returned answer
                improved = rr_seed < best_rr
                best_x = jnp.where(improved, x, best_x)
                best_rr = jnp.where(improved, rr_seed, best_rr)
                block_on = rr_seed > target2

                # ---- s BiCGStab iterations in (scaled) coefficient
                # space: seeds carry the inverse scaling c' = dG ⊙ c ----
                x_c = jnp.zeros((m,), dtype)
                r_c = jnp.zeros((m,), dtype).at[R0].set(dsafe[R0])
                p_c = jnp.zeros((m,), dtype).at[0].set(dsafe[0])
                # invariant at block boundaries: v = Ã·p (v0 = Ã·0 = 0 at
                # solve start; re-established by construction after every
                # iteration and after restarts)
                v_c = _mm(Bs, p_c)
                rr_j = rr_seed
                it_j = it
                brk = jnp.logical_not(block_on)
                for _ in range(s):
                    active = (
                        jnp.logical_not(brk)
                        & (rr_j > target2)
                        & (it_j < maxiter)
                    )
                    rho_new = jnp.sum(g * r_c)
                    ok0 = (
                        active & (rho_new != 0) & (rho != 0) & (omega != 0)
                    )
                    beta = jnp.where(
                        ok0,
                        (rho_new / jnp.where(rho == 0, one, rho))
                        * (alpha / jnp.where(omega == 0, one, omega)),
                        0.0,
                    )
                    p_new = r_c + beta * (p_c - omega * v_c)
                    p_c = jnp.where(ok0, p_new, p_c)
                    v_new = _mm(Bs, p_c)
                    v_c = jnp.where(ok0, v_new, v_c)
                    denom = jnp.sum(g * v_c)
                    ok1 = ok0 & (denom != 0)
                    alpha_n = jnp.where(
                        ok1, rho_new / jnp.where(denom == 0, one, denom), 0.0
                    )
                    s_c = r_c - alpha_n * v_c
                    t_c = _mm(Bs, s_c)
                    tt = jnp.sum(t_c * _mm(G, t_c))
                    ts = jnp.sum(t_c * _mm(G, s_c))
                    ok2 = ok1 & (tt > 0)
                    omega_n = jnp.where(
                        ok2, ts / jnp.where(tt == 0, one, tt), 0.0
                    )
                    x_n = x_c + alpha_n * p_c + omega_n * s_c
                    r_new = s_c - omega_n * t_c
                    rr_new = jnp.sum(r_new * _mm(G, r_new))
                    good = ok2 & (rr_new >= 0)
                    brk = brk | (active & jnp.logical_not(good))
                    # roll back the half-steps of a breakdown iteration —
                    # its alpha/omega came from garbage quadratic forms
                    # and would pollute x (same rollback as ca_cg)
                    x_c = jnp.where(good, x_n, x_c)
                    r_c = jnp.where(good, r_new, r_c)
                    rho = jnp.where(good, rho_new, rho)
                    alpha = jnp.where(good, alpha_n, alpha)
                    omega = jnp.where(good, omega_n, omega)
                    rr_j = jnp.where(good, rr_new, rr_j)
                    it_j = it_j + good.astype(jnp.int32)

                # breakdown: zero the direction — the next (fresh) block
                # resets rho=alpha=omega=1 and its first beta-update then
                # bootstraps p = r + beta*(0 - omega*0) = r EXACTLY, like
                # the solve-start bootstrap. (Restarting with p_c = r_c
                # instead would make that update p = r + ||r||^2*(...) —
                # a direction dominated by the stale residual whenever
                # ||r|| is far from 1.)
                fresh_next = brk & block_on
                p_c = jnp.where(fresh_next, jnp.zeros_like(p_c), p_c)

                Vstack = jnp.stack(V)
                # map scaled coefficients back: c = c'/||V_j||
                x = x + jnp.tensordot(x_c / dsafe, Vstack, axes=1, precision="highest")
                p = jnp.tensordot(p_c / dsafe, Vstack, axes=1, precision="highest")
                made_progress = it_j > it
                stall = jnp.where(
                    block_on & jnp.logical_not(made_progress), stall + 1,
                    jnp.int32(0),
                )
                # divergence exit on the trusted seed (same as ca_cg)
                stall = jnp.where(
                    rr_seed > 1e4 * best_rr, jnp.int32(2), stall
                )
                rr_out = jnp.where(block_on, jnp.maximum(rr_j, 0.0), rr_seed)
                return (
                    x, p, rhat_eff, rho, alpha, omega, rr_out, it_j, stall,
                    fresh_next, best_x, best_rr,
                )

            def cond(carry):
                rr, it, stall = carry[6], carry[7], carry[8]
                return (it < maxiter) & (rr > target2) & (stall < 2)

            x0 = jnp.zeros(nloc, dtype)
            init = (
                x0, jnp.zeros(nloc, dtype), jnp.zeros(nloc, dtype),
                one, one, one, b2, jnp.int32(0), jnp.int32(0),
                jnp.asarray(True),
                x0, jnp.asarray(jnp.inf, dtype),
            )
            (x, p, rhat, rho, alpha, omega, rr, it, _stall, _f,
             best_x, best_rr) = lax.while_loop(cond, outer_body, init)

            # honest final report: one extra exchanged matvec; fall back
            # to the best seeded iterate only when the final x is
            # pathologically worse (>100x) than it
            rr = mp.true_rr(x)
            take_cur = rr <= 100.0 * best_rr
            x = jnp.where(take_cur, x, best_x)
            rr = jnp.where(take_cur, rr, best_rr)
            if mp.S_loc is not None:
                x = mp.S_loc * x
            return x, rr, it, target2

        return run_ca_solver(local_fn, gmesh, spec, b, inv_diag)

    return global_fn
