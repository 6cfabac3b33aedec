"""Shared IR program builders mirroring the reference smoke tests
(`/root/reference/test/smoke_tests/*.mlir`) plus NumPy oracles for each.

Each builder returns (module, extras) ready for the pipeline; each oracle is
plain NumPy implementing the exact reference semantics (copy-through
boundaries, storage normalization), giving the 1e-10 agreement bar from
BASELINE.md.
"""

from __future__ import annotations

import numpy as np

from neptune_tpu.ir import (
    F64,
    Bounds,
    FieldType,
    NeptuneBuilder,
    TempType,
    TensorType,
)


def build_ac_lap(b: NeptuneBuilder, tt: TempType, interior: Bounds, name="ac_lap"):
    """Lap(u)[i] = (u[i-1] - 2u[i] + u[i+1]) * 100  (smoke_time_advance.mlir:11-31)."""
    fn = b.make_opdef(name, "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    um1 = b.access(body.args[1], [-1])
    u0 = b.access(body.args[1], [0])
    up1 = b.access(body.args[1], [1])
    lap = b.mul(
        b.constant(100.0, F64),
        b.add(b.sub(um1, b.mul(b.constant(2.0, F64), u0)), up1),
    )
    b.yield_(lap)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()
    return fn


def build_ac_A(b: NeptuneBuilder, tt: TempType, interior: Bounds, name="ac_A"):
    """A(x) = x - 1e-4 * Lap(x)  (smoke_time_advance.mlir:34-53)."""
    fn = b.make_opdef(name, "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    x = fn.body.args[0]
    lapx = b.apply_linear("ac_lap", [x])
    op, body = b.start_apply([x, lapx], interior)
    b.push_block(body)
    x0 = b.access(body.args[1], [0])
    l0 = b.access(body.args[2], [0])
    b.yield_(b.sub(x0, b.mul(b.constant(1e-4, F64), l0)))
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()
    return fn


def ac_lap_np(x: np.ndarray, lo=1, hi=15) -> np.ndarray:
    y = x.copy()
    y[lo:hi] = 100.0 * (x[lo - 1 : hi - 1] - 2 * x[lo:hi] + x[lo + 1 : hi + 1])
    return y


def ac_A_np(x: np.ndarray, lo=1, hi=15) -> np.ndarray:
    l = ac_lap_np(x, lo, hi)
    y = x.copy()
    y[lo:hi] = x[lo:hi] - 1e-4 * l[lo:hi]
    return y


def dense_from_op(op_np, n: int) -> np.ndarray:
    A = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        A[:, j] = op_np(e)
    return A


def build_allen_cahn_implicit_linear(n=16):
    """The smoke_time_advance.mlir program: explicit reaction then
    (I - dt*eps2*Lap) u1 = u*  via time_advance method=2."""
    b = NeptuneBuilder()
    bounds = Bounds.of([0], [n])
    interior = Bounds.of([1], [n - 1])
    tt = TempType("float64", bounds)
    ft = FieldType("float64", bounds)
    build_ac_lap(b, tt, interior)
    build_ac_A(b, tt, interior)

    entry = b.make_function(
        "entry",
        "func",
        [TensorType("float64", (n,)), TensorType("float64", (n,))],
        [TensorType("float64", (n,))],
    )
    b.push_block(entry.body)
    fout = b.wrap(entry.body.args[0], ft)
    fin = b.wrap(entry.body.args[1], ft)
    u0 = b.load(fin)
    # u* = u + dt*(u - u^3) on the interior
    op, body = b.start_apply([u0], interior)
    b.push_block(body)
    u = b.access(body.args[1], [0])
    dt = b.constant(1e-2, F64)
    u3 = b.mul(b.mul(u, u), u)
    b.yield_(b.add(u, b.mul(dt, b.sub(u, u3))))
    b.pop_block()
    ustar = b.finish_apply(op)
    u1 = b.time_advance(
        ustar, 1e-2, 2, system="ac_A", solver="gmres", tol=1e-10, max_iters=200
    )
    b.store(u1, fout)
    b.return_([b.unwrap(fout)])
    b.pop_block()
    return b.module


def allen_cahn_implicit_linear_oracle(uin: np.ndarray) -> np.ndarray:
    n = uin.shape[0]
    ustar = uin.copy()
    ustar[1 : n - 1] = uin[1 : n - 1] + 1e-2 * (
        uin[1 : n - 1] - uin[1 : n - 1] ** 3
    )
    A = dense_from_op(lambda x: ac_A_np(x, 1, n - 1), n)
    return np.linalg.solve(A, ustar)


def build_allen_cahn_nonlinear(n=16):
    """The smoke_time_advance_nonlinear.mlir program: fully-implicit Euler via
    Newton on F(u_next; u_prev) with boundary rows F = u_next - u_prev
    (select-based, the reference uses scf.if)."""
    b = NeptuneBuilder()
    bounds = Bounds.of([0], [n])
    tt = TempType("float64", bounds)
    ft = FieldType("float64", bounds)

    fn = b.make_opdef("ac_residual", "nonlinear_opdef", [tt, tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0], fn.body.args[1]], bounds)
    b.push_block(body)
    i = body.args[0]
    un, up = body.args[1], body.args[2]
    is_left = b.cmp("eq", i, b.constant(0, i.type))
    is_right = b.cmp("eq", i, b.constant(n - 1, i.type))
    is_boundary = b.logical_or(is_left, is_right)

    un0 = b.access(un, [0])
    up0 = b.access(up, [0])
    f_boundary = b.sub(un0, up0)

    um1 = b.access(un, [-1])
    up1 = b.access(un, [1])
    lap = b.mul(
        b.constant(100.0, F64),
        b.add(b.sub(um1, b.mul(b.constant(2.0, F64), un0)), up1),
    )
    u2 = b.mul(un0, un0)
    u3 = b.mul(u2, un0)
    react = b.sub(un0, u3)
    rhs = b.add(b.mul(b.constant(1e-2, F64), lap), react)
    f_interior = b.sub(b.sub(un0, up0), b.mul(b.constant(1e-2, F64), rhs))
    b.yield_(b.select(is_boundary, f_boundary, f_interior))
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    entry = b.make_function(
        "entry",
        "func",
        [TensorType("float64", (n,)), TensorType("float64", (n,))],
        [TensorType("float64", (n,))],
    )
    b.push_block(entry.body)
    fout = b.wrap(entry.body.args[0], ft)
    fin = b.wrap(entry.body.args[1], ft)
    u0 = b.load(fin)
    u1 = b.time_advance(
        u0, 1e-2, 1, residual="ac_residual", solver="newton", tol=1e-10, max_iters=20
    )
    b.store(u1, fout)
    b.return_([b.unwrap(fout)])
    b.pop_block()
    return b.module


def ac_residual_np(u_next: np.ndarray, u_prev: np.ndarray) -> np.ndarray:
    n = u_next.shape[0]
    F = np.empty_like(u_next)
    F[0] = u_next[0] - u_prev[0]
    F[n - 1] = u_next[n - 1] - u_prev[n - 1]
    inter = slice(1, n - 1)
    lap = 100.0 * (u_next[0 : n - 2] - 2 * u_next[inter] + u_next[2:n])
    react = u_next[inter] - u_next[inter] ** 3
    rhs = 1e-2 * lap + react
    F[inter] = u_next[inter] - u_prev[inter] - 1e-2 * rhs
    return F


def build_bs_program(n=32):
    """Black–Scholes implicit step (smoke_time_advance_bs.mlir):
    A(v) = v - dt*(a v_xx + b v_x + c v), GMRES tol 1e-10."""
    b = NeptuneBuilder()
    bounds = Bounds.of([0], [n])
    interior = Bounds.of([1], [n - 1])
    tt = TempType("float64", bounds)
    ft = FieldType("float64", bounds)

    fn = b.make_opdef("bs_A", "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    vm1 = b.access(body.args[1], [-1])
    v0 = b.access(body.args[1], [0])
    vp1 = b.access(body.args[1], [1])
    vxx = b.mul(
        b.constant(100.0, F64),
        b.add(b.sub(vm1, b.mul(b.constant(2.0, F64), v0)), vp1),
    )
    vx = b.mul(b.constant(5.0, F64), b.sub(vp1, vm1))
    L = b.add(
        b.add(b.mul(b.constant(2.0e-2, F64), vxx), b.mul(b.constant(3.0e-2, F64), vx)),
        b.mul(b.constant(-5.0e-2, F64), v0),
    )
    b.yield_(b.sub(v0, b.mul(b.constant(1e-2, F64), L)))
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    entry = b.make_function(
        "entry",
        "func",
        [TensorType("float64", (n,)), TensorType("float64", (n,))],
        [TensorType("float64", (n,))],
    )
    b.push_block(entry.body)
    fout = b.wrap(entry.body.args[0], ft)
    fin = b.wrap(entry.body.args[1], ft)
    v0 = b.load(fin)
    v1 = b.time_advance(
        v0, 1e-2, 2, system="bs_A", solver="gmres", tol=1e-10, max_iters=500
    )
    b.store(v1, fout)
    b.return_([b.unwrap(fout)])
    b.pop_block()
    return b.module


def bs_A_np(v: np.ndarray) -> np.ndarray:
    n = v.shape[0]
    y = v.copy()
    inter = slice(1, n - 1)
    vxx = 100.0 * (v[0 : n - 2] - 2 * v[inter] + v[2:n])
    vx = 5.0 * (v[2:n] - v[0 : n - 2])
    L = 2.0e-2 * vxx + 3.0e-2 * vx - 5.0e-2 * v[inter]
    y[inter] = v[inter] - 1e-2 * L
    return y


def build_heat3d_explicit(n=8, dt=1e-3):
    """3-D 7-pt heat, explicit Euler via time_advance method=0 — the rank-3
    analog of the reference's explicit path (`HighLevelConvertion.cpp:77-120`,
    which is hard-coded 1-D f64; this build is rank-generic)."""
    b = NeptuneBuilder()
    bounds = Bounds.of([0, 0, 0], [n, n, n])
    interior = Bounds.of([1, 1, 1], [n - 1, n - 1, n - 1])
    tt = TempType("float64", bounds)
    ft = FieldType("float64", bounds)

    fn = b.make_opdef("heat3d_rhs", "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], interior)
    b.push_block(body)
    u = body.args[3]
    c = b.access(u, [0, 0, 0])
    acc = None
    for off in (
        [-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]
    ):
        a = b.access(u, off)
        acc = a if acc is None else b.add(acc, a)
    lap = b.sub(acc, b.mul(b.constant(6.0, F64), c))
    b.yield_(lap)
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    entry = b.make_function(
        "entry",
        "func",
        [TensorType("float64", (n, n, n))],
        [TensorType("float64", (n, n, n))],
    )
    b.push_block(entry.body)
    f = b.wrap(entry.body.args[0], ft)
    u0 = b.load(f)
    u1 = b.time_advance(u0, dt, 0, rhs="heat3d_rhs")
    b.store(u1, f)
    b.return_([b.unwrap(f)])
    b.pop_block()
    return b.module


def heat3d_explicit_oracle(u: np.ndarray, dt=1e-3) -> np.ndarray:
    lap = np.zeros_like(u)
    c = u[1:-1, 1:-1, 1:-1]
    lap[1:-1, 1:-1, 1:-1] = (
        u[:-2, 1:-1, 1:-1] + u[2:, 1:-1, 1:-1]
        + u[1:-1, :-2, 1:-1] + u[1:-1, 2:, 1:-1]
        + u[1:-1, 1:-1, :-2] + u[1:-1, 1:-1, 2:] - 6.0 * c
    )
    # copy-through: rhs k outside the interior equals u (input0 seed), so the
    # combination apply (full domain) computes u + dt*u there... no: the
    # combination runs over the FULL bounds with k = copy-through(u). The
    # oracle must mirror the IR semantics exactly.
    k = u.copy()
    k[1:-1, 1:-1, 1:-1] = lap[1:-1, 1:-1, 1:-1]
    return u + dt * k


def build_periodic_advection4(n=16, c=0.3):
    """Periodic 4th-order centered advection (wide ±2 stencil) — exercises
    the `periodic` apply attr + wide StencilShape the reference models via
    StencilShapeAttr (`NeptuneIRAttrs.td:53-76`) but never lowers periodically."""
    b = NeptuneBuilder()
    bounds = Bounds.of([0, 0], [n, n])
    tt = TempType("float64", bounds)
    ft = FieldType("float64", bounds)

    fn = b.make_opdef("adv4", "linear_opdef", [tt], [tt])
    b.push_block(fn.body)
    op, body = b.start_apply([fn.body.args[0]], bounds, periodic=True)
    b.push_block(body)
    u = body.args[2]
    # d/dx via 4th-order central: (-u[+2] + 8u[+1] - 8u[-1] + u[-2]) / 12
    num = b.add(
        b.sub(
            b.mul(b.constant(8.0, F64), b.access(u, [1, 0])),
            b.mul(b.constant(8.0, F64), b.access(u, [-1, 0])),
        ),
        b.sub(b.access(u, [-2, 0]), b.access(u, [2, 0])),
    )
    dudx = b.mul(b.constant(1.0 / 12.0, F64), num)
    b.yield_(b.sub(b.access(u, [0, 0]), b.mul(b.constant(c, F64), dudx)))
    b.pop_block()
    b.return_([b.finish_apply(op)])
    b.pop_block()

    entry = b.make_function(
        "entry",
        "func",
        [TensorType("float64", (n, n))],
        [TensorType("float64", (n, n))],
    )
    b.push_block(entry.body)
    f = b.wrap(entry.body.args[0], ft)
    u0 = b.load(f)
    u1 = b.apply_linear("adv4", [u0])
    b.store(u1, f)
    b.return_([b.unwrap(f)])
    b.pop_block()
    return b.module


def periodic_advection4_oracle(u: np.ndarray, c=0.3) -> np.ndarray:
    dudx = (
        -np.roll(u, -2, 0) + 8 * np.roll(u, -1, 0)
        - 8 * np.roll(u, 1, 0) + np.roll(u, 2, 0)
    ) / 12.0
    return u - c * dudx
