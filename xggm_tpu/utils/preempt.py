"""Preemption-safe training: catch the scheduler's eviction notice, save a
mid-epoch checkpoint, and resume exactly where the run stopped.

The reference has no preemption or resume story at all — its only save is
`torch.save(model.state_dict())` at validation improvements (reference
src/gqa/gqa_ood.py:421-431, SURVEY §5.3/§5.4). On TPU pods this matters:
maintenance events and spot reclamation deliver SIGTERM with a short grace
window, and a 4-epoch fine-tune loses hours without mid-epoch state.

Two coordination regimes, one API (`PreemptionGuard.should_save(step)`):

* single process (the common 1-host case): a SIGTERM/SIGUSR1 handler sets a
  flag; the next step boundary reports it. Purely local — no services.
* multi-host SPMD: per-host local flags would deadlock — a host that stops
  dispatching while a peer has already enqueued the next collective step
  hangs that peer forever. Instead we lean on JAX's coordination-service
  preemption protocol (`jax.distributed.initialize` starts the sync manager
  by default): any host's SIGTERM is broadcast through the coordinator,
  which computes one safe step id (max over hosts + 1), and
  `multihost_utils.reached_preemption_sync_point(step)` returns True on ALL
  hosts at exactly that step — so every process stops dispatching at the
  same step boundary and the collective orbax save lines up.

The saved `PREEMPT` checkpoint carries the full mid-epoch loop state (see
trainer.save_preempt): params + optimizer + epoch/batch cursor + host and
device RNG states + best-valid, so `--resume` continues the SAME epoch at
the SAME shuffle position with the SAME randomness stream.
"""
from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional

import numpy as np

# exit code a preempted run terminates with: "transient failure, retry me"
# (BSD sysexits EX_TEMPFAIL) - schedulers/wrappers restart with --resume
PREEMPTED_EXIT_CODE = 75


class Preempted(Exception):
    """Raised (by trainers) after the preemption checkpoint is committed."""


class PreemptionGuard:
    """Signal-to-step-boundary bridge. Install once, poll every step."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,),
                 install: bool = True):
        self._flag = threading.Event()
        self._prev = {}
        if install and threading.current_thread() is threading.main_thread():
            for sig in signals:
                self._prev[sig] = signal.signal(sig, self._on_signal)

    def _on_signal(self, signum, frame):  # noqa: ARG002 - signal ABI
        self._flag.set()
        prev = self._prev.get(signum)
        # chain any pre-existing handler (e.g. jax's own), never re-raise
        if callable(prev) and prev not in (signal.SIG_IGN, signal.SIG_DFL):
            prev(signum, frame)

    def notify(self) -> None:
        """Programmatic preemption notice (tests, in-process schedulers)."""
        self._flag.set()

    @property
    def signaled(self) -> bool:
        return self._flag.is_set()

    def should_save(self, step_id: int) -> bool:
        """True when THIS step boundary is the agreed save-and-exit point.

        Call with a monotonically increasing per-run step id at every step.
        """
        import jax

        if jax.process_count() > 1:
            # coordination-service protocol only: all hosts get True at the
            # same safe step, keeping collective dispatch in lockstep. The
            # local flag is deliberately ignored here (per-host flags are
            # not synchronized; see module docstring).
            from jax.experimental import multihost_utils

            try:
                return bool(
                    multihost_utils.reached_preemption_sync_point(step_id))
            except RuntimeError:
                # sync manager disabled (jax_enable_preemption_service=false):
                # no safe multi-host stop point exists - behave as before
                # this feature (no preemption checkpointing)
                return False
        return self._flag.is_set()

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()


# ---------------------------------------------------------------------------
# RNG state <-> checkpoint-friendly arrays. orbax's StandardCheckpointer
# restores against a `like` pytree, so the encoding must be FIXED-SHAPE
# (pickled bytes vary in length with the state's integer magnitudes).
# random.Random state = (version, 624 Mersenne words + position, gauss_next);
# encode as uint64[627] + a float64 gauss carry.

def pack_rng_state(rng) -> np.ndarray:
    version, internal, gauss_next = rng.getstate()
    if version != 3 or len(internal) != 625:
        raise ValueError(f"unsupported random.Random state v{version}")
    has_gauss = gauss_next is not None
    head = np.asarray([version, int(has_gauss)], dtype=np.uint64)
    words = np.asarray(internal, dtype=np.uint64)
    tail = np.asarray(
        [gauss_next if has_gauss else 0.0], np.float64).view(np.uint64)
    return np.concatenate([head, words, tail])


def unpack_rng_state(rng, packed: np.ndarray) -> None:
    a = np.asarray(packed, dtype=np.uint64)
    if a.shape != (628,):
        raise ValueError(f"bad packed rng state shape {a.shape}")
    gauss = float(a[-1:].view(np.float64)[0]) if int(a[1]) else None
    rng.setstate((int(a[0]), tuple(int(x) for x in a[2:-1]), gauss))


# np.random.RandomState (the data-pipeline RNG): legacy MT19937 state =
# ('MT19937', uint32[624] key, pos, has_gauss, cached_gaussian) -> uint64[627]

def pack_np_rng_state(rng: np.random.RandomState) -> np.ndarray:
    name, key, pos, has_gauss, cached = rng.get_state()
    if name != "MT19937" or key.shape != (624,):
        raise ValueError(f"unsupported np RandomState bit generator {name}")
    head = np.asarray([pos, int(has_gauss)], dtype=np.uint64)
    tail = np.asarray([cached], np.float64).view(np.uint64)
    return np.concatenate([head, key.astype(np.uint64), tail])


def unpack_np_rng_state(rng: np.random.RandomState,
                        packed: np.ndarray) -> None:
    a = np.asarray(packed, dtype=np.uint64)
    if a.shape != (627,):
        raise ValueError(f"bad packed np rng state shape {a.shape}")
    rng.set_state((
        "MT19937", a[2:-1].astype(np.uint32), int(a[0]), int(a[1]),
        float(a[-1:].view(np.float64)[0])))
