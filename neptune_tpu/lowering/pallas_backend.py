"""Pallas TPU kernels for apply execution (stub — filled in by the kernel
milestone; `try_execute_apply` returning None falls back to the jnp path)."""

from __future__ import annotations

from typing import Optional, Sequence

from ..ir.core import Operation


def try_execute_apply(op: Operation, operand_arrays: Sequence) -> Optional[object]:
    """Return the apply result via a Pallas kernel, or None if this apply is
    not supported by the Pallas path (caller falls back to jnp)."""
    return None
