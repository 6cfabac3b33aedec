"""Simulation-state checkpointing.

The reference persists nothing but its AOT kernel cache (SURVEY.md §5 —
"checkpoint/resume: none"); this build adds field checkpointing for long
simulations: named field arrays + step metadata to a single .npz, with
sharded arrays gathered transparently. Compilation checkpointing is JAX's
persistent cache (config.setup_persistent_cache).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping, Optional

import numpy as np


def save_checkpoint(
    path: str | Path,
    fields: Mapping[str, object],
    step: int = 0,
    time: float = 0.0,
    meta: Optional[dict] = None,
) -> None:
    """Write fields + metadata atomically (tmp file + rename)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    for k in fields:
        if k in ("__meta__", "file"):
            raise ValueError(
                f"field name {k!r} is reserved ('__meta__' holds checkpoint "
                "metadata; 'file' collides with np.savez's first argument)"
            )
    arrays = {k: np.asarray(v) for k, v in fields.items()}
    payload = dict(arrays)
    payload["__meta__"] = np.frombuffer(
        json.dumps(
            {"step": int(step), "time": float(time), **(meta or {})}
        ).encode(),
        dtype=np.uint8,
    )
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> tuple[dict, dict]:
    """Returns (fields, meta)."""
    with np.load(Path(path)) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        fields = {k: z[k] for k in z.files if k != "__meta__"}
    return fields, meta
