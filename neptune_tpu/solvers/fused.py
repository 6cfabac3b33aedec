"""Fully-fused VMEM-resident CG — the whole Krylov solve in one TPU kernel.

The standard solve path runs each CG iteration as XLA ops with the state in
HBM; per-iteration dispatch and HBM round-trips dominate for small/medium
grids. For problems whose working set fits VMEM (~6 vectors: up to roughly
512×512 f32), this kernel keeps *everything* — x, r, p, Ap, and the stencil
operator — resident in VMEM and runs the full `lax.while_loop` inside a
single `pallas_call`: zero HBM traffic after the initial load, no
per-iteration launch overhead. This is the TPU-native answer to the
reference's per-iteration PETSc→dlsym callback round trip
(`NeptunePETScRuntime.cpp:182-230`).

The operator is evaluated *in-kernel* from the opdef's IR: accesses become
whole-array vector rolls (`pltpu.roll` — wrap semantics in the unspecified
zone, same contract as the jnp backend) and the copy-through boundary mask
comes from iota coordinates. Composite operators (apply_linear chains)
inline recursively.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ir.core import Function, Module, Operation
from ..ir.types import Bounds, TempType
from ..lowering import jnp_backend

_VMEM_LIMIT = 12 * 1024 * 1024


class FusionError(RuntimeError):
    pass


def _roll_access(arr, offset):
    for d, o in enumerate(offset):
        if o != 0:
            arr = pltpu.roll(arr, jnp.int32((-o) % arr.shape[d]), axis=d)
    return arr


def build_inkernel_matvec(module: Module, name: str) -> Callable:
    """A function(x: f32 array) -> f32 array evaluating opdef @name with
    kernel-compatible ops only (rolls, iota masks, elementwise)."""
    fn = module.lookup(name)
    if len(fn.ftype.inputs) != 1 or len(fn.ftype.results) != 1:
        raise FusionError("fused solve requires a unary operator")

    def run(x):
        env = {fn.body.args[0].uid: x}
        out = None
        for op in fn.body.ops:
            if op.name == "neptune.apply":
                out_type: TempType = op.results[0].type
                outer = out_type.bounds
                bounds: Bounds = op.attrs["bounds"]
                n_in = op.attrs.get("num_inputs", len(op.operands))
                inputs = [env[o.uid] for o in op.operands[:n_in]]
                scalars = [env[o.uid] for o in op.operands[n_in:]]

                in_lbs = [o.type.bounds.lb for o in op.operands[:n_in]]

                def access_fn(k, offset):
                    adj = tuple(
                        o + (lo - li)
                        for o, lo, li in zip(offset, outer.lb, in_lbs[k])
                    )
                    return _roll_access(inputs[k], adj)

                def index_fn(d):
                    iv = jax.lax.broadcasted_iota(jnp.int32, outer.shape, d)
                    return iv + outer.lb[d]

                # runs inside the fused-CG pallas_call: a performance path,
                # exempt from the pinned-arithmetic fence (config.py)
                ys = jnp_backend.eval_scalar_dag(
                    op.region(0), outer.rank, n_in, access_fn, index_fn,
                    scalars, pinned=False,
                )
                y = jnp.asarray(ys[0], x.dtype)
                y = jnp.broadcast_to(y, outer.shape)
                if bounds != outer:
                    mask = None
                    for d in range(outer.rank):
                        iv = index_fn(d)
                        m = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                        mask = m if mask is None else (mask & m)
                    seed = inputs[0] if n_in else jnp.zeros(outer.shape, x.dtype)
                    y = jnp.where(mask, y, seed)
                env[op.results[0].uid] = y
            elif op.name == "neptune.apply_linear":
                callee = build_inkernel_matvec(module, op.attrs["symbol"])
                env[op.results[0].uid] = callee(env[op.operands[0].uid])
            elif op.name == "neptune.return":
                out = env[op.operands[0].uid]
            elif op.name == "arith.constant":
                env[op.results[0].uid] = jnp.asarray(
                    op.attrs["value"], jnp.float32
                )
            else:
                raise FusionError(f"fused solve: unsupported op {op.name}")
        return out

    return run


def supported(module: Module, name: str, tt: TempType) -> bool:
    if tt.element != "float32":
        return False
    if tt.bounds.rank != 2:
        return False
    nbytes = tt.bounds.size * 4
    if nbytes * 7 > _VMEM_LIMIT:
        return False
    try:
        build_inkernel_matvec(module, name)
    except FusionError:
        return False
    return True


def fused_cg(
    module: Module,
    name: str,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
    inv_diag=None,
    interpret: bool = False,
) -> Callable:
    """Returns solve(b) -> (x, iters, resnorm): one pallas_call running the
    whole (optionally Jacobi-preconditioned) CG loop VMEM-resident."""
    fn = module.lookup(name)
    tt: TempType = fn.ftype.inputs[0]
    shape = tt.bounds.shape
    matvec = build_inkernel_matvec(module, name)
    use_precond = inv_diag is not None

    def kernel(*refs):
        if use_precond:
            b_ref, d_ref, x_ref, it_ref, rn_ref = refs
            dinv = d_ref[...]
        else:
            b_ref, x_ref, it_ref, rn_ref = refs
            dinv = None
        b = b_ref[...]
        bnorm = jnp.sqrt(jnp.sum(b * b))
        target = jnp.float32(tol) * jnp.where(bnorm == 0, 1.0, bnorm)

        x0 = jnp.zeros(shape, jnp.float32)
        r0 = b
        z0 = r0 * dinv if use_precond else r0
        p0 = z0
        rz0 = jnp.sum(r0 * z0)
        rn0 = bnorm

        def cond(st):
            x, r, z, p, rz, k, rn = st
            return (k < maxiter) & (rn > target)

        def body(st):
            x, r, z, p, rz, k, _ = st
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = r * dinv if use_precond else r
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            return x, r, z, p, rz_new, k + 1, jnp.sqrt(jnp.sum(r * r))

        x, r, z, p, rz, k, rn = jax.lax.while_loop(
            cond, body, (x0, r0, z0, p0, rz0, jnp.int32(0), rn0)
        )
        x_ref[...] = x
        it_ref[0, 0] = k
        rn_ref[0, 0] = rn

    n_in = 2 if use_precond else 1
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in
    out_specs = (
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )

    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    def solve(b):
        b = jnp.asarray(b, jnp.float32)
        if use_precond:
            x, it, rn = call(b, jnp.asarray(inv_diag, jnp.float32))
        else:
            x, it, rn = call(b)
        return x, it[0, 0], rn[0, 0]

    return solve
