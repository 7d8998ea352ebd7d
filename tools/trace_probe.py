"""Capture a jax.profiler trace of the train step and print the op-level
time breakdown (top HLO ops / categories on the device plane).

Run: python tools/trace_probe.py [--steps 5] [--prng rbg]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def capture(steps: int, prng: str, out_dir: str, unstacked: bool = False):
    import jax
    if prng:
        jax.config.update("jax_default_prng_impl", prng)
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    from xggm_tpu.config import gqa_ood_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import (
        TrainState, bf16_param_shadow, make_ggm_train_step)
    from __graft_entry__ import _make_batch

    cfg = gqa_ood_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(
        dtype="bfloat16",
        stacked_layers=not unstacked,
        bert=dataclasses.replace(cfg.lxmert.bert,
                                 use_pallas_attention=True)))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, 96, cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    import jax.numpy as jnp
    batch["feats"] = batch["feats"].astype(jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    tx = bert_adam(lr=4 * 5e-6, warmup=0.1, t_total=10_000, lr_scale=scales)
    # bf16 param shadow: the production layout (trainer default w/ bf16)
    state = TrainState(params, tx.init(params), bf16_param_shadow(params))
    step = make_ggm_train_step(model, tx, cfg.train, "relation")
    batch = jax.device_put(batch)

    state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["clean_loss"])  # compile + sync

    jax.profiler.start_trace(out_dir)
    for i in range(steps):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    float(m["clean_loss"])
    jax.profiler.stop_trace()


def analyze(out_dir: str, steps: int, top: int = 35):
    """Parse the Chrome-trace JSON (plugins/profile/*/vm.trace.json.gz):
    sum complete-event durations by op name on the device threads."""
    import gzip
    import json as jsonlib

    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace json under {out_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = jsonlib.load(f)
    events = trace["traceEvents"]
    # map (pid, tid) -> thread name; pick device-looking tracks
    tname = {}
    pname = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tname[(ev["pid"], ev["tid"])] = ev["args"]["name"]
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname[ev["pid"]] = ev["args"]["name"]

    by_track = collections.defaultdict(collections.Counter)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        track = tname.get((ev["pid"], ev["tid"]),
                          pname.get(ev["pid"], str(ev["pid"])))
        by_track[track][ev["name"]] += ev["dur"]

    for track, counter in sorted(by_track.items(),
                                 key=lambda kv: -sum(kv[1].values())):
        total = sum(counter.values())
        if total < 1000:  # <1ms total: skip noise tracks
            continue
        print(f"\n=== track: {track} "
              f"(total {total/1e3/steps:.2f} ms/step) ===")
        for name, us in counter.most_common(top):
            print(f"  {us/1e3/steps:8.3f} ms  {100*us/total:5.1f}%  "
                  f"{name[:95]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--prng", default="rbg")
    ap.add_argument("--dir", default="/tmp/xggm_trace")
    ap.add_argument("--analyze_only", action="store_true")
    ap.add_argument("--stacked", action="store_true",
                help="trace the rejected stacked-layers opt-in instead of the\n                     shipped unstacked default")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.steps, args.prng, args.dir, unstacked=not args.stacked)
    analyze(args.dir, args.steps)


if __name__ == "__main__":
    main()
