"""Benchmark: X-GGM training throughput (LXMERT+GGM fwd/bwd) on one chip.

Measures the full two-phase training step (GGM relation branch + clean phase,
two BertAdam updates - the reference's per-batch work, SURVEY.md §3.1) on the
flagship GQA-OOD configuration (LXMERT 9/5/5, hidden 768, bs 96, bf16 compute)
and reports QA pairs/sec/chip.

Baseline basis (BASELINE.md): the reference repo publishes no throughput;
the north-star is >=5x a PyTorch-GPU baseline that must itself be measured.
No GPU exists in this environment, so we use an analytic estimate of the
reference stack: ~130 GFLOP per QA pair per full batch step (2x fwd/bwd of
the 19-layer encoder at 20+36 tokens + GGM), on a V100 at ~10 TFLOP/s
effective => ~75 QA pairs/sec. vs_baseline is measured_throughput divided by
5x that estimate (375 pairs/s), so vs_baseline >= 1.0 means the 5x
north-star target is met.
"""
from __future__ import annotations

import json
import time

import numpy as np

PYTORCH_V100_ESTIMATE_PAIRS_PER_SEC = 75.0
TARGET_MULT = 5.0
BASELINE = PYTORCH_V100_ESTIMATE_PAIRS_PER_SEC * TARGET_MULT


def main():
    import jax
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from xggm_tpu.config import gqa_ood_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step
    from __graft_entry__ import _make_batch

    import dataclasses

    cfg = gqa_ood_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(
        dtype="bfloat16",
        bert=dataclasses.replace(cfg.lxmert.bert,
                                 use_pallas_attention=True)))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)

    bs = cfg.train.batch_size  # 96, the shipped recipe (script/gqa_ood.sh)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, bs, cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           4.0, 1.0)
    tx = bert_adam(lr=4 * 5e-6, warmup=0.1, t_total=10_000, lr_scale=scales)
    state = TrainState(params, tx.init(params))

    step = make_ggm_train_step(model, tx, cfg.train, "relation")
    batch = jax.device_put(batch)

    # Warmup / compile. NOTE: a host readback (not block_until_ready) is the
    # only reliable execution barrier through the axon TPU relay.
    state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["clean_loss"])

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    # the last step's metrics depend on the whole state chain
    final_loss = float(metrics["clean_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), "non-finite loss in bench run"

    pairs_per_sec = bs * n_iters / dt
    n_chips = 1  # bench runs on the single real chip
    value = pairs_per_sec / n_chips
    print(json.dumps({
        "metric": "train_qa_pairs_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "QA pairs/s/chip (LXMERT+GGM two-phase fwd/bwd, bs 96, bf16)",
        "vs_baseline": round(value / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
