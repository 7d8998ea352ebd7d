"""Native checkpointing via orbax.

Exceeds the reference's torch.save(model.state_dict()) (reference
src/gqa/gqa_ood.py:421-431 - weights only, no optimizer state, no mid-run
resume): here we checkpoint {params, opt_state, step, rng} atomically, keep
BEST / per-epoch policies (mirroring the reference's "BEST"/"BEST_{epoch}"
naming), and support exact mid-run resume.

Saves are ASYNCHRONOUS by default: `save` snapshots the state to host
(synchronous - the donated train-state buffers may be reused the moment it
returns) and commits to disk in the background, so mid-epoch BEST saves
overlap the next training steps. A barrier (`wait`) runs before any load,
before re-saving, and must be called once at end of training (the trainers
do); orbax writes atomically via a temp dir, so a crash mid-commit never
leaves a readable-but-corrupt checkpoint.
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

    def save(self, name: str, state: Dict[str, Any],
             block: bool = False) -> None:
        """Save a pytree state dict under `name` (e.g. 'BEST', 'BEST_2').

        Returns once the state is snapshotted to host; the disk commit runs
        in the background (block=True for the old synchronous behavior).
        """
        self.wait()  # one in-flight commit at a time
        path = self._path(name)
        # Force OWNED host buffers: numpy leaves pass through device_get
        # aliased, and device_get on a CPU-backed jax.Array is a zero-copy
        # VIEW of the device buffer (np.shares_memory confirms) - a later
        # donated train step may reuse that buffer mid-commit. One host
        # memcpy per leaf is trivial next to the disk write.
        # Cross-process-sharded leaves (multi-host ZeRO optimizer state)
        # go through to_host's process_allgather - a COLLECTIVE, which is
        # safe because every process calls save() in lockstep (saves are
        # deliberately not process-0-gated) and jax.tree.map traverses in
        # one deterministic order.
        import numpy as np

        from xggm_tpu.parallel.distributed import host_barrier, to_host

        if jax.process_count() > 1:
            # enforce the lockstep contract before entering the per-leaf
            # allgather collectives below: if a peer process died before
            # reaching save(), this bounded KV-store barrier fails fast
            # with a timeout instead of hanging in the collective forever.
            # The counter keeps barrier ids unique across repeated saves
            # of the same name (the coordination service consumes an id
            # once; all processes save in lockstep so counters agree).
            self._save_seq = getattr(self, "_save_seq", 0) + 1
            host_barrier(f"ckpt-save:{name}:{self._save_seq}",
                         timeout_s=600)

        def _host_copy(x):
            if isinstance(x, np.ndarray):
                return x.copy()
            y = to_host(x) if hasattr(x, "sharding") else jax.device_get(x)
            return y.copy() if isinstance(y, np.ndarray) else y

        snapshot = jax.tree.map(_host_copy, state)
        self._ckptr.save(path, snapshot, force=True)
        if block:
            self.wait()

    def wait(self) -> None:
        """Barrier for any in-flight background commit."""
        self._ckptr.wait_until_finished()

    def load(self, name: str, like: Optional[Dict[str, Any]] = None
             ) -> Dict[str, Any]:
        self.wait()
        path = self._path(name)
        if like is not None:
            # cross-process-sharded template leaves can't device_get; their
            # shape/dtype is all the restore needs (callers re-place the
            # restored host arrays through _make_state / device_put)
            import numpy as np

            def _template(x):
                if getattr(x, "is_fully_addressable", True):
                    return x
                return np.zeros(x.shape, x.dtype)

            like = jax.tree.map(_template, like)
            return self._ckptr.restore(path, target=jax.device_get(like))
        return self._ckptr.restore(path)

    def exists(self, name: str) -> bool:
        self.wait()
        return os.path.isdir(self._path(name))

    def remove(self, name: str) -> None:
        """Delete a checkpoint if present (e.g. a consumed PREEMPT cursor)."""
        self.wait()
        path = self._path(name)
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)

    def latest_epoch(self) -> Optional[int]:
        """Find the newest BEST_{epoch} checkpoint for resume."""
        self.wait()
        best = -1
        for d in os.listdir(self.output_dir):
            if d.startswith("BEST_"):
                try:
                    best = max(best, int(d.split("_")[1]))
                except ValueError:
                    pass
        return best if best >= 0 else None
