"""Native checkpointing via orbax.

Exceeds the reference's torch.save(model.state_dict()) (reference
src/gqa/gqa_ood.py:421-431 - weights only, no optimizer state, no mid-run
resume): here we checkpoint {params, opt_state, step, rng} atomically, keep
BEST / per-epoch policies (mirroring the reference's "BEST"/"BEST_{epoch}"
naming), and support exact mid-run resume.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


class CheckpointManager:
    def __init__(self, output_dir: str):
        import orbax.checkpoint as ocp

        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: Dict[str, Any]) -> None:
        """Save a pytree state dict under `name` (e.g. 'BEST', 'BEST_2')."""
        path = self._path(name)
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()

    def load(self, name: str, like: Optional[Dict[str, Any]] = None
             ) -> Dict[str, Any]:
        path = self._path(name)
        if like is not None:
            return self._ckptr.restore(path, target=jax.device_get(like))
        return self._ckptr.restore(path)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def latest_epoch(self) -> Optional[int]:
        """Find the newest BEST_{epoch} checkpoint for resume."""
        best = -1
        for d in os.listdir(self.output_dir):
            if d.startswith("BEST_"):
                try:
                    best = max(best, int(d.split("_")[1]))
                except ValueError:
                    pass
        return best if best >= 0 else None
