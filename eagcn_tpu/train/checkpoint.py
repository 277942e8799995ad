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
        """Atomic: write to a tmp dir, then rename into place.  A killed
        process can therefore never leave a half-written latest checkpoint
        (observed in round 4: a kill mid-save produced a step dir whose
        restore wedged the next run)."""
        path = self._step_dir(step)
        tmp = f"{path}.tmp{os.getpid()}"
        payload = _to_numpy(payload)
        if self._ckpt is not None:
            self._ckpt.save(tmp, payload, force=True)
        else:  # pragma: no cover
            import pickle

            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "state.pkl"), "wb") as f:
                pickle.dump(payload, f)
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        self._gc()
        return path

    def _steps(self):
        if not os.path.isdir(self.directory):
            return []
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_") and ".tmp" not in name:
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def _restore_one(self, step: int) -> Dict[str, Any]:
        path = self._step_dir(step)
        if self._ckpt is not None:
            payload = self._ckpt.restore(path)
        else:  # pragma: no cover
            import pickle

            with open(os.path.join(path, "state.pkl"), "rb") as f:
                payload = pickle.load(f)
        # integrity gate on the model-critical subtrees: every float leaf
        # finite and materialized.  (Metadata like `val_history` may hold
        # legitimate NaNs — `maybe_resume` filters those.)
        critical = (
            {k: payload[k] for k in ("params", "state", "opt_state")
             if k in payload}
            if isinstance(payload, dict) else payload
        )
        for leaf in jax.tree_util.tree_leaves(critical):
            a = np.asarray(leaf)
            if np.issubdtype(a.dtype, np.floating) and not np.all(
                    np.isfinite(a)):
                raise ValueError(f"non-finite leaf in checkpoint {path}")
        return payload

    def restore(self, step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Restore `step`, or the newest checkpoint that passes the
        integrity gate — a damaged latest step falls back to the previous
        one instead of poisoning the resumed run."""
        if step is not None:
            return self._restore_one(step)
        for s in reversed(self._steps()):
            try:
                return self._restore_one(s)
            except Exception as e:
                print(f"checkpoint step {s} unusable ({e}); trying older",
                      flush=True)
        return None

    def _gc(self) -> None:
        import shutil

        for s in self._steps()[: -self.max_to_keep]:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)
        for name in os.listdir(self.directory):  # stale tmp dirs from kills
            if name.startswith("step_") and ".tmp" in name:
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)
