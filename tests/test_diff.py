"""Differentiable-solver tests: implicit gradients through linear solves and
Newton roots, validated against finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptune_tpu as ntp
from neptune_tpu.solvers.diff import differentiable_root, differentiable_solve


@pytest.fixture(autouse=True)
def fresh():
    ntp.reset_context()
    yield
    ntp.reset_context()


def _fd_grad(f, x, eps=1e-6, sample=6):
    """Central-difference gradient at a few sampled indices (keeps the suite
    fast — each probe costs two full solves). Returns (indices, values)."""
    rng = np.random.default_rng(42)
    flat_idx = rng.choice(x.size, size=min(sample, x.size), replace=False)
    vals = []
    for fi in flat_idx:
        d = np.zeros_like(x)
        d.flat[fi] = eps
        vals.append((f(x + d) - f(x - d)) / (2 * eps))
    return flat_idx, np.asarray(vals)


class TestDifferentiableSolve:
    def test_grad_wrt_rhs(self):
        n = 24
        # SPD tridiagonal system
        def mv(x):
            return 2 * x - jnp.roll(x, 1).at[0].set(0) - jnp.roll(x, -1).at[-1].set(0)

        def loss(b):
            x = differentiable_solve(mv, b, solver="cg", symmetric=True, tol=1e-13)
            return jnp.sum(x**2)

        b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        g = np.asarray(jax.grad(loss)(b))
        idx, g_fd = _fd_grad(lambda bb: float(loss(jnp.asarray(bb))), np.asarray(b))
        np.testing.assert_allclose(g.flat[idx], g_fd, rtol=1e-4, atol=1e-6)

    def test_grad_wrt_operator_parameter(self):
        # d/dtheta of sum(x) where (I*theta + L) x = b — parameter inside
        # the closed-over operator
        n = 16

        def lap(x):
            return 2 * x - jnp.roll(x, 1).at[0].set(0) - jnp.roll(x, -1).at[-1].set(0)

        b = jnp.asarray(np.random.default_rng(1).standard_normal(n))

        def loss(theta):
            def mv(x):
                return theta * x + lap(x)

            x = differentiable_solve(mv, b, solver="cg", symmetric=True, tol=1e-13)
            return jnp.sum(x)

        g = float(jax.grad(loss)(1.5))
        eps = 1e-6
        g_fd = (float(loss(1.5 + eps)) - float(loss(1.5 - eps))) / (2 * eps)
        assert abs(g - g_fd) < 1e-5 * max(1.0, abs(g_fd))

    def test_grad_through_opdef_solve(self):
        # end-to-end: gradient of a functional of a stencil-operator solve
        # w.r.t. the right-hand side, through the compiled opdef matvec
        @ntp.linear_op_def(bounds=([0], [32]), interior=([1], [31]))
        def lap(u):
            return 2.0 * u[0] - u[-1] - u[1]

        mv = ntp.get_context().compiled().opdef("lap")

        def loss(b):
            x = differentiable_solve(mv, b, solver="bicgstab", tol=1e-13, maxiter=2000)
            return jnp.sum(jnp.sin(x))

        b = jnp.asarray(np.random.default_rng(2).standard_normal(32))
        g = np.asarray(jax.grad(loss)(b))
        idx, g_fd = _fd_grad(lambda bb: float(loss(jnp.asarray(bb))), np.asarray(b))
        np.testing.assert_allclose(g.flat[idx], g_fd, rtol=1e-3, atol=1e-6)


class TestDifferentiableRoot:
    def test_grad_through_newton(self):
        # x solves x^3 + x = b; dx/db = 1/(3x^2+1)
        def loss(b):
            def F(x):
                return x**3 + x - b

            x = differentiable_root(F, jnp.zeros_like(b), tol=1e-13)
            return jnp.sum(x)

        b = jnp.asarray([0.5, 1.0, 2.0, 3.0])
        g = np.asarray(jax.grad(loss)(b))
        # analytic: at root x*, d x*/db = 1/(3 x*^2 + 1)
        def root(bv):
            x = bv / 2
            for _ in range(100):
                x = x - (x**3 + x - bv) / (3 * x**2 + 1)
            return x

        xs = root(np.asarray(b))
        np.testing.assert_allclose(g, 1.0 / (3 * xs**2 + 1), rtol=1e-8)

    def test_grad_through_implicit_step(self):
        # gradient of an implicit (backward-Euler) heat step w.r.t. the
        # previous state — the building block for adjoint time integration
        n = 16
        dt = 0.5

        def lap(x):
            return 2 * x - jnp.roll(x, 1).at[0].set(0) - jnp.roll(x, -1).at[-1].set(0)

        def loss(u_prev):
            def F(u):
                return u + dt * lap(u) - u_prev

            u = differentiable_root(F, u_prev, tol=1e-13)
            return jnp.sum(u**2)

        u0 = jnp.asarray(np.random.default_rng(3).standard_normal(n))
        g = np.asarray(jax.grad(loss)(u0))
        idx, g_fd = _fd_grad(lambda uu: float(loss(jnp.asarray(uu))), np.asarray(u0))
        np.testing.assert_allclose(g.flat[idx], g_fd, rtol=1e-4, atol=1e-7)


class TestAdjointSimulation:
    def test_grad_through_simulate(self):
        # adjoint time integration: d(loss of final state)/d(initial state)
        # through 20 explicit steps via simulate(differentiable=True)
        def lap(x):
            return 2 * x - jnp.roll(x, 1).at[0].set(0) - jnp.roll(x, -1).at[-1].set(0)

        def step(u):
            return u - 0.1 * lap(u)

        def loss(u0):
            uT = ntp.simulate(step, u0, 20, differentiable=True, jit=False)
            return jnp.sum(uT**2)

        u0 = jnp.asarray(np.random.default_rng(0).standard_normal(12))
        g = np.asarray(jax.grad(loss)(u0))
        idx, g_fd = _fd_grad(lambda uu: float(loss(jnp.asarray(uu))), np.asarray(u0))
        np.testing.assert_allclose(g.flat[idx], g_fd, rtol=1e-5, atol=1e-8)
