"""Differentiable solves — gradients through linear and nonlinear solvers.

A capability with no reference counterpart (PETSc solves are opaque C calls):
because the whole solve is a traced JAX computation, we can expose *implicit*
derivatives — O(1) memory, one extra (adjoint) solve — instead of
differentiating through thousands of Krylov iterations:

  * ``differentiable_solve``: wraps a matrix-free Krylov solve in
    `lax.custom_linear_solve`, so d/db and d/dθ (parameters closed over by
    the operator) both flow via an adjoint/transpose solve;
  * ``differentiable_root``: wraps Newton–Krylov in `lax.custom_root`
    (implicit function theorem), making implicit time steps and steady
    states differentiable.

This turns the framework into an inverse-problem/optimization tool: gradients
of functionals of PDE solutions w.r.t. coefficients, boundary data, or
initial conditions.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import krylov
from .newton import newton_krylov


def differentiable_solve(
    matvec: Callable,
    b,
    *,
    solver: str = "cg",
    symmetric: bool = False,
    tol: float = 1e-10,
    maxiter: int = 1000,
    M: Optional[Callable] = None,
):
    """Solve A x = b with implicit differentiation.

    `matvec` may close over differentiable parameters; gradients w.r.t. both
    `b` and those parameters are exact (up to solver tolerance), computed via
    one adjoint solve with Aᵀ (same operator when symmetric=True).
    """

    def solve_fn(mv, rhs):
        x, _ = krylov.solve(mv, rhs, solver=solver, tol=tol, maxiter=maxiter, M=M)
        return x

    def transpose_solve_fn(mv_T, rhs):
        x, _ = krylov.solve(mv_T, rhs, solver=solver, tol=tol, maxiter=maxiter, M=M)
        return x

    return jax.lax.custom_linear_solve(
        matvec,
        b,
        solve_fn,
        transpose_solve=transpose_solve_fn,
        symmetric=symmetric,
    )


def differentiable_root(
    residual: Callable,
    x0,
    *,
    tol: float = 1e-10,
    max_iters: int = 50,
    krylov_tol: float = 1e-8,
    krylov_iters: int = 300,
):
    """Solve F(x) = 0 with implicit differentiation (lax.custom_root).

    `residual` may close over differentiable parameters; the backward pass
    solves one linear system with ∂F/∂x at the root (exact jvp/vjp, no
    differentiation through Newton iterations).
    """

    def solve(f, x0):
        x, _ = newton_krylov(
            f,
            x0,
            tol=tol,
            max_iters=max_iters,
            krylov_tol=krylov_tol,
            krylov_iters=krylov_iters,
        )
        return x

    def tangent_solve(g, y):
        # solve the linearized system g(x) = y; reverse mode transposes this,
        # so it must itself be a custom_linear_solve (a raw while_loop GMRES
        # is not transposable)
        return differentiable_solve(
            g, y, solver="gmres", tol=krylov_tol, maxiter=krylov_iters
        )

    return jax.lax.custom_root(residual, x0, solve, tangent_solve)
