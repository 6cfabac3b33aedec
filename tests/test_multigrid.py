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
