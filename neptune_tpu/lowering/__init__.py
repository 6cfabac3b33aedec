"""Lowering/execution layer: IR -> JAX callables (jnp + Pallas backends)."""

from .executor import CompiledModule, compile_module

__all__ = ["CompiledModule", "compile_module"]
