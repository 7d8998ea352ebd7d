"""Metrics logging (reference §5.5: tensorboardX scalars gated by
--tf_writer, gqa_ood.py:294-335; plain-text log.log; args.json dump).

Writes JSONL (always) + TensorBoard events when tensorboardX/tensorboard is
importable - same scalar names as the reference where they exist.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    SCALAR_MAP = {
        "clean_loss": "Train/batch_loss",
        "ggm_loss": "Train/ggm_loss",
        "d_loss": "Train/d_loss",
        "loss_grad": "Train/loss_grad",
        "loss_sm": "Train/loss_sm",
    }

    def __init__(self, output_dir: str, use_tb: bool = True):
        # output_dir=None mutes the logger (non-primary processes in a
        # multi-host run: one metrics stream, not num_hosts copies)
        self.output_dir = output_dir
        if output_dir is None:
            self.jsonl = open(os.devnull, "w")
            self.tb = None
            return
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(output_dir, "logs"))
            except Exception:
                self.tb = None

    def log_step(self, step: int, metrics: Dict, branch: str = "") -> None:
        from xggm_tpu.parallel.distributed import host_scalar

        rec = {"step": step, "branch": branch, "ts": time.time()}
        for k, v in metrics.items():
            if k == "preds":
                continue
            try:
                rec[k] = host_scalar(v)
            except (TypeError, ValueError):
                continue
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in rec.items():
                if k in self.SCALAR_MAP:
                    self.tb.add_scalar(self.SCALAR_MAP[k], v, step)

    def log_scalar(self, name: str, value: float, step: int) -> None:
        self.jsonl.write(json.dumps(
            {"step": step, name: float(value), "ts": time.time()}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar(name, value, step)

    def dump_config(self, cfg_dict: Dict, name: str = "args.json") -> None:
        if self.output_dir is None:
            return
        with open(os.path.join(self.output_dir, name), "w") as f:
            json.dump(cfg_dict, f, indent=2, default=str)
