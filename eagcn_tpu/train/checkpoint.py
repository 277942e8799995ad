"""Orbax checkpointing with deterministic resume.

The reference only saves final weights (`eagcn_pytorch/train.py:439-440,
474-475`) and has NO resume path.  Here: periodic checkpoints of
params / BN state / optimizer state / epoch / PRNG key, restorable to
continue a run bit-deterministically (the data order is derived from the
epoch index, so resume reproduces the exact stream)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Thin wrapper over orbax PyTree checkpointing (with a numpy .npz
    fallback if orbax is unavailable)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._ckpt = ocp.PyTreeCheckpointer()
        except Exception:  # pragma: no cover
            self._ocp = None
            self._ckpt = None

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, payload: Dict[str, Any]) -> str:
        path = self._step_dir(step)
        payload = _to_numpy(payload)
        if self._ckpt is not None:
            self._ckpt.save(path, payload, force=True)
        else:  # pragma: no cover
            import pickle

            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "state.pkl"), "wb") as f:
                pickle.dump(payload, f)
        self._gc()
        return path

    def latest_step(self) -> Optional[int]:
        if not os.path.isdir(self.directory):
            return None
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        path = self._step_dir(step)
        if self._ckpt is not None:
            return self._ckpt.restore(path)
        import pickle  # pragma: no cover

        with open(os.path.join(path, "state.pkl"), "rb") as f:
            return pickle.load(f)

    def _gc(self) -> None:
        steps = sorted(
            int(n.split("_")[1])
            for n in os.listdir(self.directory)
            if n.startswith("step_")
        )
        import shutil

        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)
