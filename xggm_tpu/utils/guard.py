"""Training failure detection (aux subsystem, SURVEY.md §5.3).

The reference has none: a NaN loss silently corrupts every subsequent
optimizer step and surfaces hours later as a garbage checkpoint. Here every
trainer loop checks the step's scalar metrics (already on host for logging,
so the check is free) and aborts with a diagnostic the moment anything goes
non-finite.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class TrainingDiverged(RuntimeError):
    """Raised when a training step produces non-finite metrics."""


def check_step_finite(step: int, branch: str, metrics: Dict) -> None:
    """Raise TrainingDiverged listing every non-finite scalar in `metrics`.

    Array-valued entries (e.g. 'preds') are skipped; scalars are checked on
    host. Call after the step's metrics have been read back (the trainers
    already sync them for prediction logging, so this adds no device sync).
    """
    from xggm_tpu.parallel.distributed import host_scalar

    bad = {}
    for k, v in metrics.items():
        try:
            f = host_scalar(v)
        except (TypeError, ValueError):
            continue  # non-scalar (preds etc.)
        if not np.isfinite(f):
            bad[k] = f
    if bad:
        detail = ", ".join(f"{k}={v}" for k, v in sorted(bad.items()))
        raise TrainingDiverged(
            f"non-finite metrics at step {step} (branch={branch!r}): "
            f"{detail}. Common causes: lr too high for the schedule, fp16/"
            "bf16 overflow in a custom loss, or corrupt input features. "
            "The last good checkpoint is unaffected - resume with --resume "
            "after fixing the cause.")
