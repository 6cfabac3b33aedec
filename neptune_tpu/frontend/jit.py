"""@jit_class — lazy trace-and-compile solver classes.

Rebuild of the reference's `JITClassWrapper` (`python_frontend/neptune/jit.py:
8-155`), whose flow is: trace `__init__` into a `<Cls>_init` function whose
return value is the runtime context, trace the first-called method into
`<Cls>_<method>`, AOT-compile to a `.so`, then dispatch via ctypes with the
context pointer as arg 0.

TPU-native redesign: `__init__` runs **eagerly** (assemble_matrix yields a
live lazy MatrixHandle — no separate init function or context pointer is
needed; the handle is closed over at trace time, replacing the reference's
dlsym-by-name indirection). Each method is traced once into an IR function on
first call, lowered through the pipeline, and wrapped in `jax.jit`; subsequent
calls dispatch straight to the compiled XLA executable.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import numpy as np

from ..ir.types import Bounds, FunctionType, ScalarType, TempType
from . import expr as E
from .core import get_context
from .dsl import Expr, MatrixExpr


def _arg_spec(a):
    """Classify a sample argument -> (ir type, binder)."""
    if isinstance(a, Expr) and isinstance(a.node, E.TempLeaf):
        return a.node.ttype
    if hasattr(a, "shape") and hasattr(a, "dtype"):
        arr = np.asarray(a)
        # canonicalize f64 -> f32 when x64 is disabled: jax would truncate
        # the data anyway, so trace the IR at the dtype that will execute
        dt = jax.dtypes.canonicalize_dtype(arr.dtype).name
        return TempType(dt, Bounds.of((0,) * arr.ndim, arr.shape))
    if isinstance(a, float):
        return ScalarType(jax.dtypes.canonicalize_dtype(np.float64).name)
    if isinstance(a, int):
        return ScalarType("int32")
    raise TypeError(f"cannot trace argument of type {type(a)}")


def trace_method(ctx, name: str, bound_method: Callable, sample_args):
    """Trace one call of `bound_method` into an IR function named `name`."""
    arg_types = [_arg_spec(a) for a in sample_args]
    b = ctx.builder
    fn = b.make_function(name, "func", arg_types, [])
    ctx.current_function = fn
    b.push_block(fn.body)
    ok = False
    try:
        exprs = []
        for v in fn.body.args:
            if isinstance(v.type, TempType):
                exprs.append(Expr(E.TempLeaf(v.type, ir_value=v)))
            else:
                exprs.append(Expr(E.ScalarRef(ir_value=v, stype=v.type)))
        result = bound_method(*exprs)
        outs = result if isinstance(result, (tuple, list)) else (result,)
        out_vals = []
        for o in outs:
            if isinstance(o, Expr) and getattr(o.node, "ir_value", None) is not None:
                out_vals.append(o.node.ir_value)
            elif isinstance(o, MatrixExpr):
                out_vals.append(o.ir_value)
            else:
                raise TypeError(
                    f"method {name} must return traced Exprs, got {type(o)}"
                )
        b.return_(out_vals)
        fn.ftype = FunctionType(
            tuple(arg_types), tuple(v.type for v in out_vals)
        )
        ok = True
    finally:
        b.pop_block()
        ctx.current_function = None
        if not ok:
            # don't leave a half-traced, terminator-less symbol behind
            ctx.module.functions.pop(name, None)
    ctx.bump()
    return fn


class JITClassWrapper:
    def __init__(self, cls, *args, **kwargs):
        self._cls = cls
        self._ctx = get_context()
        # Phase 1 (reference traces this; we run it eagerly — state members
        # like assemble_matrix handles come out live and lazy)
        self._instance = cls(*args, **kwargs)
        self._compiled_methods: dict[tuple, Callable] = {}

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        inst_attr = getattr(self._instance, name)
        if not callable(inst_attr):
            return inst_attr

        def method_proxy(*args):
            # cache per (method, arg signature): a second call with different
            # shapes/dtypes re-traces into a fresh IR function instead of
            # failing the first trace's shape check
            sig = tuple(
                (np.asarray(a).shape, str(np.asarray(a).dtype))
                if hasattr(a, "shape") or isinstance(a, (int, float))
                else type(a).__name__
                for a in args
            )
            key = (name, sig)
            if key not in self._compiled_methods:
                fn_name = f"{self._cls.__name__}_{name}"
                if fn_name in self._ctx.module.functions:
                    fn_name = f"{fn_name}_{len(self._compiled_methods)}_{id(self):x}"
                trace_method(self._ctx, fn_name, inst_attr, args)
                compiled = self._ctx.compiled().function(fn_name)
                self._compiled_methods[key] = jax.jit(compiled)
            return self._compiled_methods[key](*args)

        return method_proxy


def jit_class(cls):
    """Decorator (reference `jit.py:150-155`)."""

    @functools.wraps(cls)
    def wrapper(*args, **kwargs):
        return JITClassWrapper(cls, *args, **kwargs)

    return wrapper
