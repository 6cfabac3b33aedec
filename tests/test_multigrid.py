"""Geometric multigrid: V-cycle convergence, h-independence, and use as a
Krylov preconditioner. Cross-checked against CG on the same operator."""

import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.solvers import cg, mg_preconditioner, multigrid_solve


def poisson_ops(sizes, dtype="float64"):
    """Re-discretized 5-point Poisson handles, finest first."""
    ntp.reset_context()
    def make(n):
        inv_h2 = float((n - 1) * (n - 1))

        @ntp.linear_op_def(
            bounds=([0, 0], [n, n]),
            interior=([1, 1], [n - 1, n - 1]),
            dtype=dtype,
            name=f"poisson{n}",
        )
        def op(u):
            return (4.0 * u[0, 0] - u[-1, 0] - u[1, 0]
                    - u[0, -1] - u[0, 1]) * inv_h2

        return op

    return [ntp.assemble_matrix(make(n)) for n in sizes]


class TestMultigrid:
    def test_vcycle_converges(self):
        ops = poisson_ops([128, 64, 32, 16])
        rng = np.random.default_rng(0)
        b = rng.standard_normal((128, 128))
        x, info = multigrid_solve(ops, b, tol=1e-9, maxiter=60)
        assert bool(info.converged), f"resnorm {float(info.resnorm):.2e}"
        r = b - np.asarray(ops[0].matvec(jnp.asarray(x)))
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b) * 1.01

    def test_matches_direct(self):
        # oracle: dense LU of the assembled operator (the copy-through
        # system is nonsymmetric at the ring, so direct > CG as reference)
        ops = poisson_ops([64, 32, 16])
        rng = np.random.default_rng(1)
        b = rng.standard_normal((64, 64))
        x_mg, info = multigrid_solve(ops, b, tol=1e-11, maxiter=100)
        assert bool(info.converged)
        A = np.asarray(ops[0].dense())
        x_direct = np.linalg.solve(A, b.ravel()).reshape(64, 64)
        np.testing.assert_allclose(
            np.asarray(x_mg), x_direct, atol=1e-8, rtol=1e-6
        )

    def test_h_independence(self):
        # the per-cycle contraction factor must not degrade with resolution
        # (the property that distinguishes MG from single-level relaxation;
        # iteration counts at fixed relative tol DO grow slightly because the
        # initial residual of the 1/h^2-scaled operator grows with 1/h^2)
        from neptune_tpu.solvers.multigrid import build_levels, v_cycle

        factors = {}
        for sizes in ([64, 32, 16], [128, 64, 32, 16]):
            ops = poisson_ops(sizes)
            rng = np.random.default_rng(2)
            b = jnp.asarray(rng.standard_normal((sizes[0], sizes[0])))
            lv = build_levels(ops, b)
            x = jnp.where(lv[0].interior, jnp.zeros_like(b), b)
            norms = []
            for _ in range(10):
                x = v_cycle(lv, b, x)
                norms.append(float(jnp.linalg.norm(b - lv[0].matvec(x))))
            # asymptotic factor: geometric mean of the last 5 ratios
            fac = (norms[-1] / norms[4]) ** (1 / 5)
            factors[sizes[0]] = fac
        assert factors[128] <= factors[64] + 0.1, factors
        assert all(f < 0.7 for f in factors.values()), factors

    def test_as_cg_preconditioner(self):
        # CG needs the SPD interior subspace: zero-ring rhs (homogeneous
        # Dirichlet data) — the copy-through operator is nonsymmetric at
        # the ring, so a rhs with boundary data is BiCGStab/GMRES territory
        ops = poisson_ops([64, 32, 16])
        rng = np.random.default_rng(3)
        b = np.zeros((64, 64))
        b[1:-1, 1:-1] = rng.standard_normal((62, 62))
        b = jnp.asarray(b)
        _, plain = cg(ops[0].matvec, b, tol=1e-8, maxiter=20000)
        M = mg_preconditioner(ops, b)
        x, pre = cg(ops[0].matvec, b, tol=1e-8, maxiter=200, M=M)
        assert bool(pre.converged)
        # MG-preconditioned CG should be an order of magnitude cheaper
        assert int(pre.iters) * 10 < int(plain.iters), (
            int(pre.iters), int(plain.iters),
        )
        r = b - ops[0].matvec(x)
        assert float(jnp.linalg.norm(r)) <= 1e-8 * float(jnp.linalg.norm(b)) * 1.01

    def test_cheb_smoother(self):
        """Chebyshev smoothing (reduction-free, mesh-native) must converge
        at a multigrid-like rate and stay a valid linear preconditioner."""
        ops = poisson_ops([128, 64, 32, 16])
        rng = np.random.default_rng(7)
        b = rng.standard_normal((128, 128))
        x, info = multigrid_solve(ops, b, tol=1e-9, maxiter=60, smoother="cheb")
        assert bool(info.converged), f"resnorm {float(info.resnorm):.2e}"
        r = b - np.asarray(ops[0].matvec(jnp.asarray(x)))
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b) * 1.01

        # as a CG preconditioner (linearity: fixed degree + fixed bounds)
        ops3 = poisson_ops([64, 32, 16])
        b2 = np.zeros((64, 64))
        b2[1:-1, 1:-1] = rng.standard_normal((62, 62))
        b2 = jnp.asarray(b2)
        M = mg_preconditioner(ops3, b2, smoother="cheb")
        x2, pre = cg(ops3[0].matvec, b2, tol=1e-8, maxiter=200, M=M)
        assert bool(pre.converged)
        assert int(pre.iters) < 40

    def test_unknown_smoother_rejected(self):
        ops = poisson_ops([32, 16])
        b = np.zeros((32, 32))
        with pytest.raises(ValueError, match="unknown smoother"):
            multigrid_solve(ops, b, maxiter=1, smoother="sor")

    def test_f32(self):
        ops = poisson_ops([64, 32, 16], dtype="float32")
        rng = np.random.default_rng(4)
        b = rng.standard_normal((64, 64)).astype(np.float32)
        x, info = multigrid_solve(ops, b, tol=1e-4, maxiter=40)
        assert bool(info.converged)


def test_multigrid_3d():
    # transfers are rank-agnostic: 7-point Poisson on a 32^3 -> 16^3 -> 8^3
    # hierarchy must converge with the same machinery
    ntp.reset_context()

    def make(n):
        inv_h2 = float((n - 1) * (n - 1))

        @ntp.linear_op_def(
            bounds=([0, 0, 0], [n, n, n]),
            interior=([1, 1, 1], [n - 1, n - 1, n - 1]),
            dtype="float64",
            name=f"poisson3d{n}",
        )
        def op(u):
            return (
                6.0 * u[0, 0, 0]
                - u[-1, 0, 0] - u[1, 0, 0]
                - u[0, -1, 0] - u[0, 1, 0]
                - u[0, 0, -1] - u[0, 0, 1]
            ) * inv_h2

        return op

    ops = [ntp.assemble_matrix(make(n)) for n in (32, 16, 8)]
    rng = np.random.default_rng(5)
    b = rng.standard_normal((32, 32, 32))
    x, info = multigrid_solve(ops, b, tol=1e-8, maxiter=40)
    assert bool(info.converged), f"rn={float(info.resnorm):.2e}"
    r = b - np.asarray(ops[0].matvec(jnp.asarray(x)))
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b) * 1.01


def test_odd_shape_rejected():
    ntp.reset_context()

    @ntp.linear_op_def(
        bounds=([0, 0], [33, 33]), interior=([1, 1], [32, 32]),
        dtype="float64", name="odd",
    )
    def op(u):
        return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

    h = ntp.assemble_matrix(op)
    with pytest.raises(ValueError, match="coarsenable"):
        multigrid_solve([h, h], np.zeros((33, 33)))


def test_fmg_start_saves_cycles():
    from neptune_tpu.solvers.multigrid import build_levels, fmg_start
    import jax

    ops = poisson_ops([128, 64, 32, 16])
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.standard_normal((128, 128)))
    lv = build_levels(ops, b)

    x_fmg = jax.jit(lambda b: fmg_start(lv, b))(b)
    _, from_zero = multigrid_solve(ops, b, tol=1e-9, maxiter=60, levels=lv)
    x, from_fmg = multigrid_solve(
        ops, b, x0=x_fmg, tol=1e-9, maxiter=60, levels=lv
    )
    assert bool(from_fmg.converged)
    assert int(from_fmg.iters) < int(from_zero.iters), (
        int(from_fmg.iters), int(from_zero.iters),
    )
    r = b - ops[0].matvec(x)
    assert float(jnp.linalg.norm(r)) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01


class TestCoarsenOpdef:
    """passes.coarsen: re-instantiate an opdef at halved bounds (the
    rediscretization behind solve_linear(..., precond="mg"); VERDICT r3
    missing #1's mg half)."""

    def _mk(self, n, name):
        @ntp.linear_op_def(
            bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]),
            dtype="float64", name=name,
        )
        def op(u):
            return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

        return op

    def test_coarse_matvec_matches_hand_built(self):
        from neptune_tpu.lowering.executor import CompiledModule
        from neptune_tpu.passes.coarsen import coarsen_opdef

        ntp.reset_context()
        self._mk(64, "fine")
        mod = ntp.get_context().compiled().module
        coarse = coarsen_opdef(mod, "fine")
        mv_c = CompiledModule(coarse, "jnp").opdef("fine")

        ntp.reset_context()
        hand = ntp.assemble_matrix(self._mk(32, "hand"))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((32, 32)))
        np.testing.assert_array_equal(
            np.asarray(mv_c(x)), np.asarray(hand.matvec(x))
        )

    def test_margins_preserved(self):
        from neptune_tpu.passes.coarsen import coarsen_opdef

        ntp.reset_context()

        @ntp.nonlinear_op_def(
            bounds=([0, 0], [64, 128]), interior=([2, 3], [62, 125]),
            dtype="float64", name="wide",
        )
        def wide(u):
            return u[0, 0] - 0.1 * (u[-2, 0] + u[2, 0] + u[0, -3] + u[0, 3])

        mod = ntp.get_context().compiled().module
        coarse = coarsen_opdef(mod, "wide")
        fn = coarse.lookup("wide")
        assert fn.ftype.inputs[0].bounds.shape == (32, 64)
        ap = [o for o in fn.walk() if o.name == "neptune.apply"][0]
        assert ap.attrs["bounds"].lb == (2, 3)
        assert ap.attrs["bounds"].ub == (30, 61)

    def test_odd_extent_rejected(self):
        from neptune_tpu.passes.coarsen import coarsen_opdef

        ntp.reset_context()
        self._mk(34, "odd17")  # 34 halves to 17: a second halving must fail
        mod = ntp.get_context().compiled().module
        c1 = coarsen_opdef(mod, "odd17")
        with pytest.raises(ValueError, match="coarsenable"):
            coarsen_opdef(c1, "odd17")

    def test_non_opdef_rejected(self):
        from neptune_tpu.ir import Bounds, NeptuneBuilder, TensorType
        from neptune_tpu.passes.coarsen import coarsen_opdef

        b = NeptuneBuilder()
        fn = b.make_function(
            "entry", "func",
            [TensorType("float64", (8, 8))], [TensorType("float64", (8, 8))],
        )
        b.push_block(fn.body)
        b.return_([fn.body.args[0]])
        b.pop_block()
        with pytest.raises(NotImplementedError, match="not an opdef"):
            coarsen_opdef(b.module, "entry")


class TestMGPrecondAttr:
    """precond='mg' through solve_linear (executor IR path + dsl eager) —
    VERDICT r3 next-round #3."""

    def _poisson(self, n, name="pmg"):
        ntp.reset_context()

        @ntp.linear_op_def(
            bounds=([0, 0], [n, n]), interior=([1, 1], [n - 1, n - 1]),
            dtype="float64", name=name,
        )
        def pmg(u):
            return 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]

        return ntp.assemble_matrix(pmg)

    def test_eager_mg_converges_fast(self):
        H = self._poisson(128)
        rng = np.random.default_rng(0)
        b = rng.standard_normal((128, 128))
        x = ntp.solve_linear(
            H, b, solver="cg", tol=1e-10, max_iters=60, precond="mg",
        )
        r = b - np.asarray(H.matvec(jnp.asarray(x)))
        assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(b) * 1.01

    def test_mg_beats_jacobi_iterations(self):
        from neptune_tpu.lowering.executor import auto_mg_preconditioner
        from neptune_tpu.solvers import cg
        from neptune_tpu.solvers.precond import jacobi as jacobi_pc

        H = self._poisson(128, name="pmg2")
        mod = ntp.get_context().compiled().module
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal((128, 128)))
        M = auto_mg_preconditioner(mod, H, "jnp")
        x1, i1 = cg(H.matvec, b, tol=1e-8, maxiter=400, M=M)
        Mj = jacobi_pc(H.matvec, jnp.zeros((128, 128)), H.halo)
        x0, i0 = cg(H.matvec, b, tol=1e-8, maxiter=400, M=Mj)
        assert bool(i1.converged)
        assert int(i1.iters) < 40, int(i1.iters)  # h-independent cycle count
        assert int(i1.iters) * 3 < int(i0.iters) or not bool(i0.converged)

    def test_ir_path_with_mg_levels_option(self):
        from neptune_tpu.ir import (
            Bounds, F64, FieldType, NeptuneBuilder, TempType, TensorType,
        )
        from neptune_tpu.passes import compile_ir

        n = 64
        b = NeptuneBuilder()
        bounds = Bounds.of([0, 0], [n, n])
        interior = Bounds.of([1, 1], [n - 1, n - 1])
        tt = TempType("float64", bounds)

        fn = b.make_opdef("lapA", "linear_opdef", [tt], [tt])
        b.push_block(fn.body)
        op, body = b.start_apply([fn.body.args[0]], interior)
        b.push_block(body)
        u = body.args[2]
        s = b.access(u, [-1, 0])
        for o in ([1, 0], [0, -1], [0, 1]):
            s = b.add(s, b.access(u, o))
        b.yield_(b.sub(b.mul(b.constant(4.0, F64), b.access(u, [0, 0])), s))
        b.pop_block()
        b.return_([b.finish_apply(op)])
        b.pop_block()

        entry = b.make_function(
            "entry", "func",
            [TensorType("float64", (n, n))], [TensorType("float64", (n, n))],
        )
        b.push_block(entry.body)
        rhs = b.load(b.wrap(entry.body.args[0], FieldType("float64", bounds)))
        A = b.assemble_matrix("lapA")
        x = b.solve_linear(
            A, rhs, solver="cg", tol=1e-10, max_iters=80, precond="mg",
            options={"mg_levels": 2, "mg_smoother": "jacobi"},
        )
        b.return_([x])
        b.pop_block()

        cm = compile_ir(b.module)
        rng = np.random.default_rng(2)
        bb = rng.standard_normal((n, n))
        x = np.asarray(cm.function("entry")(bb))

        ntp.reset_context()
        H = self._poisson(n, name="oracle64")
        r = bb - np.asarray(H.matvec(jnp.asarray(x)))
        assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(bb) * 1.01

    def test_precond_option_validation(self):
        from neptune_tpu.utils.options import split_precond_options

        with pytest.raises(ValueError, match="omega"):
            split_precond_options({"omega": 1.2}, "jacobi")
        with pytest.raises(ValueError, match="mg_levels"):
            split_precond_options({"mg_levels": 3}, "ssor")
        with pytest.raises(ValueError, match="mg_smoother"):
            split_precond_options({"mg_smoother": "rb"}, "mg")
        out = split_precond_options({"omega": 1.2}, "ssor")
        assert out == {"omega": 1.2}

    def test_mg_rejects_uncoarsenable(self):
        H = self._poisson(24, name="tiny")  # 24 -> 12: min extent < 16
        with pytest.raises(ValueError, match="mg"):
            ntp.solve_linear(
                H, np.ones((24, 24)), solver="cg", precond="mg",
            )
