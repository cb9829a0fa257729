"""Checkpointing: full training-state snapshots with exact resume.

The reference pickles only (params, epoch) and resets the epoch counter on
restart (vqmc.py:68-71, 91 — a silent bug).  Here the checkpoint carries
params + optimizer state + walker state + PRNG key + step counter, written
atomically (tmp + rename), with an orbax-backed variant for multi-host
runs (host 0 writes, others no-op).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_state(path: str | Path, state: dict[str, Any]) -> None:
    """Atomic single-process checkpoint (pickle of device_get'd pytrees)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix('.tmp')
    with open(tmp, 'wb') as f:
        pickle.dump(jax.device_get(state), f)
    tmp.replace(path)


def load_state(path: str | Path) -> dict[str, Any] | None:
    path = Path(path)
    if not path.exists():
        return None
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_state_multihost(path: str | Path, state: dict[str, Any]) -> None:
    """Host-0-writes checkpoint for multi-host runs; all hosts must call
    (acts as a barrier via process_index check only — data is replicated)."""
    if jax.process_index() == 0:
        save_state(path, state)


class OrbaxCheckpointer:
    """Orbax-backed checkpoint manager (async-capable, versioned steps)."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: dict[str, Any]) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state))

    def restore(self, step: int | None = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step)

    def close(self):
        self.manager.close()
