"""Library-surface drive: train X-GGM on synthetic data end-to-end.

Runs the full two-phase training loop (GGM branch + clean phase, two BertAdam
updates per batch — the reference's per-batch work, src/gqa/gqa_ood.py:151-289)
at the tiny config on an 8-virtual-device CPU mesh, then evaluates.

Usage:  python examples/train_synthetic.py [--steps 8] [--tpu]
(--tpu skips the CPU forcing and runs on whatever jax.devices() offers.)
"""
from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real backend instead of the CPU mesh")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from xggm_tpu.config import tiny_test_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.parallel.mesh import make_mesh, shard_batch
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step
    from xggm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..",
                                          "tests", ".jax_cache"))

    cfg = tiny_test_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    mesh = make_mesh() if not args.tpu else None

    B = 16
    rng = np.random.RandomState(0)
    L, N = 20, 36
    batch = {
        "input_ids": rng.randint(0, cfg.lxmert.bert.vocab_size,
                                 (B, L)).astype(np.int32),
        "input_mask": np.ones((B, L), np.int32),
        "segment_ids": np.zeros((B, L), np.int32),
        "feats": rng.randn(B, N, cfg.lxmert.visual.visual_feat_dim
                           ).astype(np.float32),
        "boxes": rng.rand(B, N, 4).astype(np.float32),
        "adj": (rng.rand(B, N, N) > 0.7).astype(np.float32),
        "target": np.eye(cfg.num_answers, dtype=np.float32)[
            rng.randint(0, cfg.num_answers, B)],
    }
    if mesh is not None:
        batch = shard_batch(mesh, batch)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    tx = bert_adam(lr=1e-3, warmup=0.1, t_total=1000, lr_scale=scales)
    state = TrainState(params, tx.init(params))
    steps = {br: make_ggm_train_step(model, tx, cfg.train, br)
             for br in ("relation", "representation")}

    host_rng = random.Random(0)
    first_loss = None
    for i in range(args.steps):
        br = ("relation" if host_rng.randint(1, 10) <= cfg.ggm.delta
              else "representation")
        state, m = steps[br](state, batch, jax.random.PRNGKey(i))
        clean = float(m["clean_loss"])
        ggm = float(m["ggm_loss"])
        if first_loss is None:
            first_loss = clean
        print(f"step {i:2d} [{br[:3]}] clean_loss={clean:.4f} "
              f"ggm_loss={ggm:.4f}", flush=True)
        assert np.isfinite(clean) and np.isfinite(ggm), "non-finite loss"

    count = int(np.asarray(state.opt_state.count))
    assert count == 2 * args.steps, (
        f"two optimizer updates per batch expected: {count}")
    assert clean < first_loss, (
        f"clean loss did not decrease: {first_loss:.4f} -> {clean:.4f}")

    preds = np.asarray(m["preds"])
    assert preds.shape == (B,), preds.shape
    print(f"OK: loss {first_loss:.4f} -> {clean:.4f}, "
          f"opt_steps={count}, preds shape {preds.shape}, "
          f"devices={len(jax.devices())}")


if __name__ == "__main__":
    main()
