"""Multi-host (DCN) initialization.

SURVEY.md §5 prescribes `jax.distributed.initialize` for multi-host slices
(process groups over DCN; ICI within each host's chips). The GridMesh/GSPMD
machinery is host-count agnostic — once initialized, `jax.devices()` spans
the slice and everything else works unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join (or bootstrap) a multi-host JAX runtime. On single-host setups
    this is a no-op returning the local device count.

    On TPU pods the arguments are auto-detected from the environment; on
    other clusters pass them explicitly (mirrors jax.distributed.initialize).
    """
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1 and _looks_like_pod():
            jax.distributed.initialize()
    except RuntimeError as e:
        # calling twice is fine (idempotent join); anything else — bad
        # coordinator, port clash, heartbeat failure — must surface, not
        # silently leave the process single-host
        if "already initialized" not in str(e).lower():
            raise
    return len(jax.devices())


def _looks_like_pod() -> bool:
    import os

    return any(
        k in os.environ
        for k in ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    )
