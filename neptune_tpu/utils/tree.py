"""Pytree vector-space utilities for matrix-free solvers.

The reference's PETSc runtime works on flat `Vec` buffers packed from strided
memrefs (`lib/Runtime/PETSc/NeptunePETScRuntime.cpp:897-1426`). The TPU-native
equivalent keeps grid-shaped (and multi-field tuple) states as JAX pytrees and
performs vector-space algebra leaf-wise — XLA fuses these into the surrounding
solver iteration, and multi-field nonlinear states (the
`test/python_tests/test_swe_implicit.py` tuple-state API) come for free.

Reduction determinism: `tdot`/`tnorm` accumulate with jnp.vdot/jnp.sum per leaf
then sum leaves in fixed pytree order, so convergence behavior is bitwise
reproducible run-to-run on a fixed topology (the "bit-stable convergence"
target in BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
from jax import tree_util as jtu


def tmap(f, *trees):
    return jtu.tree_map(f, *trees)


def tadd(a, b):
    return jtu.tree_map(jnp.add, a, b)


def tsub(a, b):
    return jtu.tree_map(jnp.subtract, a, b)


def tscale(alpha, a):
    return jtu.tree_map(lambda x: alpha * x, a)


def taxpy(alpha, x, y):
    """y + alpha * x, leaf-wise."""
    return jtu.tree_map(lambda xi, yi: yi + alpha * xi, x, y)


def tneg(a):
    return jtu.tree_map(jnp.negative, a)


def tzeros_like(a):
    return jtu.tree_map(jnp.zeros_like, a)


def tdot(a, b):
    """Sum of leaf-wise real inner products (fixed association order)."""
    leaves_a = jtu.tree_leaves(a)
    leaves_b = jtu.tree_leaves(b)
    acc = None
    for x, y in zip(leaves_a, leaves_b):
        d = jnp.vdot(x, y)
        acc = d if acc is None else acc + d
    return acc


def tnorm(a):
    return jnp.sqrt(tdot(a, a))


def tsize(a) -> int:
    return sum(x.size for x in jtu.tree_leaves(a))


def ravel(a):
    """Flatten a pytree to a vector; returns (vec, unravel_fn)."""
    return jax.flatten_util.ravel_pytree(a)
