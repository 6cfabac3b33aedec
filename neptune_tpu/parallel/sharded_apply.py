"""Explicit shard_map execution of compiled operators.

Complements the GSPMD path (`parallel.sharded`): instead of letting XLA's
partitioner infer the communication, each device runs the operator *locally*
on a halo-extended block — ghost cells fetched once up front by
`halo_pad_local` (lax.ppermute over ICI), boundary masks computed from traced
global coordinates. The halo depth is the opdef's verified `total_shape`
reach, so composite operators (apply_linear chains) need exactly one exchange
per application, not one per stage.

This is the deterministic-communication execution mode (and the substrate the
Pallas-local multi-chip path will plug into); the jnp local executor is used
for the per-shard compute.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map

from ..ir.core import Module, Operation
from ..ir.types import Bounds, TempType
from ..lowering import jnp_backend
from .halo import halo_pad_local
from .mesh import GridMesh


def _eval_apply_local(
    op: Operation, ext_arrays, scalars, ext_shape, global_start, backend="jnp"
):
    """Evaluate one apply over a halo-extended local block.

    global_start[d]: traced global logical coordinate of ext row 0 in dim d.
    Boundary copy-through masks compare traced global indices against the
    op's static bounds (the static interior_mask path cannot be used because
    each shard sees a different window).
    """
    out_type: TempType = op.results[0].type
    n_in = op.attrs.get("num_inputs", len(op.operands))
    bounds: Bounds = op.attrs["bounds"]
    outer = out_type.bounds
    rank = outer.rank

    if backend == "pallas":
        from ..config import config
        from ..lowering import pallas_backend

        if pallas_backend.window_supported(op, ext_shape) and (
            pallas_backend._on_tpu() or config.pallas_interpret
        ):
            return pallas_backend.execute_apply_window(
                op,
                ext_arrays,
                scalars,
                ext_shape,
                global_start,
                interpret=config.pallas_interpret,
            )

    input_lbs = [v.type.bounds.lb for v in op.operands[:n_in]]

    def access_fn(k, offset):
        adj = tuple(
            o + (lo - li) for o, lo, li in zip(offset, outer.lb, input_lbs[k])
        )
        return jnp_backend.shift_read(ext_arrays[k], adj)

    def index_fn(d):
        iv = jax.lax.broadcasted_iota(jnp.int32, ext_shape, d)
        return iv + global_start[d]

    ys = jnp_backend.eval_scalar_dag(
        op.region(0), rank, n_in, access_fn, index_fn, scalars
    )
    dtype = jnp.dtype(out_type.element)
    outs = []
    for j, y in enumerate(ys):
        y = jnp.broadcast_to(jnp.asarray(y, dtype), ext_shape)
        if bounds != outer:
            mask = None
            for d in range(rank):
                iv = index_fn(d)
                m = (iv >= bounds.lb[d]) & (iv < bounds.ub[d])
                mask = m if mask is None else (mask & m)
            seed = (
                ext_arrays[j]
                if j < n_in
                else jnp.zeros(ext_shape, dtype)
            )
            y = jnp.where(mask, y, seed)
        outs.append(y)
    return outs[0] if len(outs) == 1 else tuple(outs)


def _eval_opdef_local(
    module: Module, name: str, ext_args, ext_shape, start, backend="jnp"
):
    """Run an opdef body on halo-extended blocks (intermediate results keep
    the extended domain; values in the margin become progressively garbage,
    which is fine — the final interior is within every stage's valid zone
    because the exchange depth is the *composed* reach)."""
    fn = module.lookup(name)
    env = {a.uid: v for a, v in zip(fn.body.args, ext_args)}
    out = None
    for op in fn.body.ops:
        if op.name == "neptune.apply":
            n_in = op.attrs.get("num_inputs", len(op.operands))
            ins = [env[o.uid] for o in op.operands[:n_in]]
            scs = [env[o.uid] for o in op.operands[n_in:]]
            res = _eval_apply_local(op, ins, scs, ext_shape, start, backend)
            if len(op.results) == 1:
                env[op.results[0].uid] = res
            else:
                for r, v in zip(op.results, res):
                    env[r.uid] = v
        elif op.name in ("neptune.apply_linear", "neptune.apply_nonlinear"):
            sub = _eval_opdef_local(
                module,
                op.attrs["symbol"],
                [env[o.uid] for o in op.operands],
                ext_shape,
                start,
                backend,
            )
            subs = sub if isinstance(sub, tuple) else (sub,)
            for r, v in zip(op.results, subs):
                env[r.uid] = v
        elif op.name == "arith.constant":
            env[op.results[0].uid] = jnp.asarray(
                op.attrs["value"], jnp_backend._scalar_dtype(op.results[0].type)
            )
        elif op.name == "neptune.return":
            vals = [env[o.uid] for o in op.operands]
            out = vals[0] if len(vals) == 1 else tuple(vals)
        else:
            raise NotImplementedError(
                f"shard_map opdef execution: unsupported op {op.name}"
            )
    return out


def shardmap_opdef(
    cm, name: str, gmesh: GridMesh, backend: str = "jnp"
) -> Callable:
    """Explicit-communication sharded matvec for opdef @name.

    cm: a CompiledModule over a *verified* module (halo annotations present).
    backend="pallas" runs each shard's compute through the slab-blocked
    Pallas window kernel (TPU multi-chip production path); "jnp" (default)
    uses the whole-window XLA lowering.
    Returns a jittable global function over mesh-sharded arrays.
    """
    fn = cm.module.lookup(name)
    halo = fn.attrs.get("halo")
    if halo is None:
        raise ValueError(
            f"@{name} has no halo annotation; compile the module through the "
            "pipeline (verify_and_annotate) first"
        )
    tt: TempType = fn.ftype.inputs[0]
    rank = tt.bounds.rank
    if not halo:
        halo = tuple((0, 0) for _ in range(rank))
    names = list(gmesh.axis_names[:rank]) + [None] * (rank - len(gmesh.axis_names))
    spec = gmesh.pspec(rank)
    n_args = len(fn.ftype.inputs)

    def global_fn(*arrays):
        def local_fn(*locs):
            local_shape = locs[0].shape
            exts = [halo_pad_local(x, halo, names) for x in locs]
            ext_shape = exts[0].shape
            start = []
            for d in range(rank):
                nm = names[d]
                base = (
                    lax.axis_index(nm) * local_shape[d] if nm else jnp.int32(0)
                )
                start.append(
                    jnp.asarray(base, jnp.int32)
                    - jnp.int32(halo[d][0])
                    + jnp.int32(tt.bounds.lb[d])
                )
            out = _eval_opdef_local(
                cm.module, name, exts, ext_shape, start, backend
            )

            def carve(y):
                sl = tuple(
                    slice(halo[d][0], halo[d][0] + local_shape[d])
                    for d in range(rank)
                )
                return y[sl]

            if isinstance(out, tuple):
                return tuple(carve(y) for y in out)
            return carve(out)

        n_out = len(fn.ftype.results)
        return shard_map(
            local_fn,
            mesh=gmesh.mesh,
            in_specs=(spec,) * n_args,
            out_specs=(spec,) * n_out if n_out > 1 else spec,
            check_vma=False,
        )(*arrays)

    return global_fn
