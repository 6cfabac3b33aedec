"""Long-simulation driver: periodic checkpointing + crash resume.

The reference has no failure handling at all (it aborts on any error and
persists nothing — SURVEY.md §5). This driver gives production simulations
the standard recovery loop: run N steps at a time on-device (`lax.fori_loop`
chunks), checkpoint atomically every `checkpoint_every` steps, and resume
from the last checkpoint after a crash/restart — the PDE analog of training
checkpoint/resume.
"""

from __future__ import annotations

import time as _time
from pathlib import Path
from typing import Callable, Mapping, Optional

import jax
import numpy as np

from .checkpoint import load_checkpoint, save_checkpoint


class SimulationDriver:
    """Runs `state = step(state)` with periodic checkpoints.

    state is a dict of named field arrays (pytree-of-arrays by name, which is
    what the checkpoint format stores).
    """

    def __init__(
        self,
        step: Callable[[dict], dict],
        checkpoint_path: str | Path,
        checkpoint_every: int = 100,
        dt: float = 0.0,
    ):
        if int(checkpoint_every) < 1:
            raise ValueError("checkpoint_every must be >= 1")
        self.step = step
        self.path = Path(checkpoint_path)
        self.every = int(checkpoint_every)
        self.dt = float(dt)
        self._chunked = {}

    def _chunk_runner(self, n: int):
        if n not in self._chunked:

            @jax.jit
            def run(state):
                return jax.lax.fori_loop(0, n, lambda i, s: self.step(s), state)

            self._chunked[n] = run
        return self._chunked[n]

    def resume_or_init(self, init_state: Mapping[str, np.ndarray]):
        """Returns (state, start_step): the checkpointed state if one exists,
        the initial state otherwise."""
        if self.path.exists():
            fields, meta = load_checkpoint(self.path)
            return dict(fields), int(meta["step"])
        return dict(init_state), 0

    def run(
        self,
        init_state: Mapping[str, np.ndarray],
        n_steps: int,
        *,
        walltime_budget_s: Optional[float] = None,
        on_checkpoint: Optional[Callable[[int, dict], None]] = None,
    ) -> tuple[dict, int]:
        """Advance to n_steps total (counting any resumed progress).

        Stops early (after a checkpoint) when the walltime budget is spent —
        rerunning the same call later resumes where it left off.
        """
        state, step0 = self.resume_or_init(init_state)
        t0 = _time.time()
        step = step0
        while step < n_steps:
            chunk = min(self.every, n_steps - step)
            state = self._chunk_runner(chunk)(state)
            step += chunk
            host_state = {k: np.asarray(v) for k, v in state.items()}
            save_checkpoint(
                self.path, host_state, step=step, time=step * self.dt
            )
            if on_checkpoint:
                on_checkpoint(step, host_state)
            if walltime_budget_s and _time.time() - t0 > walltime_budget_s:
                break
        return {k: np.asarray(v) for k, v in state.items()}, step
