"""Shard-count stability of distributed Krylov solves at realistic size.

BASELINE.md's bar is "CG iters/sec **converging bit-stably**" and SURVEY §7
hard part (b) is fixed-reduction-order distributed CG. This suite solves the
same 256² f64 Poisson system on 1-, 2-, 4-, and 8-shard meshes (1-D and 2-D
decompositions) and asserts:
  * every mesh converges,
  * iteration counts are identical across shard counts (reduction layouts
    must not perturb the Krylov trajectory at f64), and
  * converged solutions agree to tight tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.parallel import GridMesh, sharded_opdef
from neptune_tpu.solvers import krylov

N = 256
TOL = 1e-8


def _poisson_module():
    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0, 0], [N, N]), interior=([1, 1], [N - 1, N - 1]), dtype="float64"
    )
    def poisson(u):
        return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

    return ntp.get_context().compiled()


def _rhs():
    rng = np.random.default_rng(7)
    b = rng.standard_normal((N, N))
    b[0, :] = b[-1, :] = b[:, 0] = b[:, -1] = 0.0
    return b


MESHES = [(1,), (2,), (4,), (8,), (2, 2), (4, 2)]


@pytest.mark.parametrize("shape", MESHES, ids=[str(s) for s in MESHES])
def test_cg_shard_count_invariance(shape, _cache={}):
    if "ref" not in _cache:
        cm = _poisson_module()
        b = jnp.asarray(_rhs())
        x, info = jax.jit(
            lambda bb: krylov.cg(cm.opdef("poisson"), bb, tol=TOL, maxiter=3000)
        )(b)
        assert bool(info.converged), "single-device reference CG must converge"
        _cache["ref"] = (np.asarray(x), int(info.iters))
        _cache["cm"] = cm

    cm = _cache["cm"]
    x_ref, iters_ref = _cache["ref"]

    gm = GridMesh(shape)
    mv = sharded_opdef(cm, "poisson", gm)
    b_sh = gm.shard(jnp.asarray(_rhs()))

    @jax.jit
    def solve(bb):
        return krylov.cg(mv, bb, tol=TOL, maxiter=3000)

    x, info = solve(b_sh)
    assert bool(info.converged), f"mesh {shape}: CG did not converge"
    assert int(info.iters) == iters_ref, (
        f"mesh {shape}: iteration count {int(info.iters)} != single-device "
        f"{iters_ref} — reduction order perturbed the Krylov trajectory"
    )
    # converged solutions agree far below the discretization scale
    err = np.abs(np.asarray(x) - x_ref).max()
    scale = max(1.0, np.abs(x_ref).max())
    assert err / scale < 1e-9, f"mesh {shape}: solution drift {err:.3e}"


PINNED_MESHES = [(1,), (8,), (4, 2)]


def test_cg_pinned_arithmetic_bitwise_across_meshes():
    """`config.pinned_arithmetic` makes GSPMD-sharded CG BITWISE identical
    across mesh shapes — the full BASELINE.md "bit-stable convergence" bar.

    Default arithmetic only reaches ~1e-14 agreement (FMA contraction and
    reduction tiling are local-shape-dependent); the pinned mode fences
    every multiply out of FMA reach and reduces dot products through a
    fixed pairwise tree, so the Krylov trajectory — every iterate, every
    rounding — is a pure function of the global problem."""
    from neptune_tpu.config import config

    config.pinned_arithmetic = True
    try:
        cm = _poisson_module()
        b = _rhs()
        sols = {}
        for shape in PINNED_MESHES:
            gm = GridMesh(shape)
            mv = sharded_opdef(cm, "poisson", gm)
            b_sh = gm.shard(jnp.asarray(b))
            x, info = jax.jit(
                lambda bb, mv=mv: krylov.cg(mv, bb, tol=TOL, maxiter=3000)
            )(b_sh)
            assert bool(info.converged), f"mesh {shape}: did not converge"
            sols[shape] = (np.asarray(x), int(info.iters))
        x_ref, it_ref = sols[PINNED_MESHES[0]]
        for shape in PINNED_MESHES[1:]:
            x_s, it_s = sols[shape]
            assert it_s == it_ref, f"mesh {shape}: {it_s} != {it_ref}"
            same = np.array_equal(x_s, x_ref)  # bitwise (no tolerance)
            assert same, (
                f"mesh {shape}: pinned solve not bitwise identical; "
                f"max |diff| = {np.abs(x_s - x_ref).max():.3e}"
            )
    finally:
        config.pinned_arithmetic = False


def test_pinned_fence_scoped_to_gspmd_paths():
    """config.py documents pinned_arithmetic as jnp/GSPMD-only: the
    shard_map fused paths (ca_*, shardmap_*) are performance paths and keep
    default arithmetic. eval_scalar_dag is shared between both, so the
    fence must be gated per caller — the GSPMD jaxpr carries the
    select-based fence (is_finite), the shard_map fused jaxpr must not."""
    from neptune_tpu.config import config
    from neptune_tpu.parallel import shardmap_opdef

    config.pinned_arithmetic = True
    try:
        ntp.reset_context()
        n = 64

        @ntp.linear_op_def(
            bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]),
            dtype="float32",
        )
        def lap(u):
            return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

        cm = ntp.get_context().compiled()
        gm = GridMesh((2, 2))
        x = gm.shard(jnp.zeros((n, n), jnp.float32))
        gspmd_jaxpr = str(jax.make_jaxpr(sharded_opdef(cm, "lap", gm))(x))
        fused_jaxpr = str(jax.make_jaxpr(shardmap_opdef(cm, "lap", gm))(x))
        assert "is_finite" in gspmd_jaxpr, (
            "GSPMD path lost the pinned-arithmetic FMA fence"
        )
        assert "is_finite" not in fused_jaxpr, (
            "shard_map fused path picked up the fence — it is documented "
            "to keep default arithmetic (config.py pinned_arithmetic)"
        )
    finally:
        config.pinned_arithmetic = False


def test_pinned_wide_stencil_f32_apply_chain_bitwise():
    """Pinned-mode coverage beyond the one CG config (round-3 review): an
    f32 4th-order advection operator — mul-heavy body, h0 = 2 — applied 50
    times under GSPMD must be BITWISE identical across mesh shapes. This
    exercises the apply-body mul fence directly (it must be the
    select-based _fma_fence; optimization_barrier is stripped by XLA)."""
    from neptune_tpu.config import config

    config.pinned_arithmetic = True
    try:
        ntp.reset_context()

        @ntp.nonlinear_op_def(
            bounds=([0, 0], [N, N]), interior=([2, 2], [N - 2, N - 2]),
            dtype="float32",
        )
        def adv4(u):
            dudx = (-u[2, 0] + 8.0 * u[1, 0] - 8.0 * u[-1, 0] + u[-2, 0]) / 12.0
            dudy = (-u[0, 2] + 8.0 * u[0, 1] - 8.0 * u[0, -1] + u[0, -2]) / 12.0
            return u[0, 0] - 0.1 * (0.7 * dudx + 0.3 * dudy)

        cm = ntp.get_context().compiled()
        x0 = np.asarray(_rhs(), np.float32)
        outs = {}
        for shape in PINNED_MESHES:
            gm = GridMesh(shape)
            mv = sharded_opdef(cm, "adv4", gm)

            @jax.jit
            def run(v, mv=mv):
                return jax.lax.fori_loop(0, 50, lambda i, u: mv(u), v)

            outs[shape] = np.asarray(run(gm.shard(jnp.asarray(x0))))
        ref = outs[PINNED_MESHES[0]]
        for shape in PINNED_MESHES[1:]:
            assert np.array_equal(outs[shape], ref), (
                f"mesh {shape}: pinned apply chain not bitwise identical; "
                f"max |diff| = {np.abs(outs[shape] - ref).max():.3e}"
            )
    finally:
        config.pinned_arithmetic = False


def test_gmres_sharded_agrees_with_single_device():
    """GMRES (the reference's default KSP) through ravel-based reductions
    under sharding — VERDICT r1 flagged this path as CG-only-tested.

    System: implicit-heat operator u - 0.2 lap(u) (the operator class GMRES
    actually solves in time_advance; restarted GMRES without preconditioning
    stagnates on pure Poisson, which is what CG is for)."""
    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0, 0], [N, N]), interior=([1, 1], [N - 1, N - 1]), dtype="float64"
    )
    def heatA(u):
        return u[0, 0] - 0.2 * (
            u[-1, 0] + u[1, 0] + u[0, -1] + u[0, 1] - 4.0 * u[0, 0]
        )

    cm = ntp.get_context().compiled()
    b = jnp.asarray(_rhs())
    x1, info1 = jax.jit(
        lambda bb: krylov.gmres(cm.opdef("heatA"), bb, tol=1e-10, maxiter=400)
    )(b)
    assert bool(info1.converged)

    gm = GridMesh((4, 2))
    mv = sharded_opdef(cm, "heatA", gm)
    b_sh = gm.shard(jnp.asarray(_rhs()))
    x8, info8 = jax.jit(
        lambda bb: krylov.gmres(mv, bb, tol=1e-10, maxiter=400)
    )(b_sh)
    assert bool(info8.converged)
    assert int(info8.iters) == int(info1.iters)
    err = np.abs(np.asarray(x8) - np.asarray(x1)).max()
    assert err / max(1.0, np.abs(np.asarray(x1)).max()) < 1e-9
