"""Benchmark: X-GGM training throughput (LXMERT+GGM fwd/bwd) on one chip.

Measures the full two-phase training step (GGM relation branch + clean phase,
two BertAdam updates - the reference's per-batch work, SURVEY.md §3.1) on the
flagship GQA-OOD configuration (LXMERT 9/5/5, hidden 768, bs 96, bf16
compute, rbg PRNG for dropout, bf16 feature transfer), and reports:

  value                : steady-state step throughput (QA pairs/s/chip) -
                         the same metric as round 1
  e2e_pairs_per_sec    : end-to-end throughput with the REAL input pipeline -
                         xpack-backed feeder producing fresh batches, host
                         branch draw alternating relation/representation
                         (the reference's per-batch behavior, gqa_ood.py:177)

bs 96 is the recipe-pinned batch (script/gqa_ood.sh); larger batches amortize
the per-update optimizer cost further (bs 384 reached 1003 pairs/s on the
round-1 build).

Baseline basis (BASELINE.md): the reference repo publishes no throughput;
the north-star is >=5x a PyTorch-GPU baseline that must itself be measured.
`tools/measure_torch_baseline.py` measures the reference stack on this host
(torch CPU, per-pair FLOPs via torch.profiler, host tokenization cost) and
derives the V100 number from the measured FLOP count + a documented 35%-MFU
assumption; it writes baseline_measured.json, which this script reads.
vs_baseline is measured_throughput / (5 x derived V100 pairs/s), so
vs_baseline >= 1.0 means the 5x north-star target is met. If the measured
file is absent, the round-1 analytic estimate (75 pairs/s) is the fallback.
"""
from __future__ import annotations

import json
import os
import random
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
PYTORCH_V100_ESTIMATE_PAIRS_PER_SEC = 75.0  # analytic fallback (round 1)
TARGET_MULT = 5.0
E2E_IMAGES, E2E_QUESTIONS = 256, 4032


def _baseline_pairs_per_sec() -> float:
    path = os.path.join(HERE, "baseline_measured.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["v100_pairs_per_sec"])
    return PYTORCH_V100_ESTIMATE_PAIRS_PER_SEC


BASELINE = _baseline_pairs_per_sec() * TARGET_MULT


class _PadTargets:
    """Widen the synthetic corpus' answer targets to the flagship head size
    so e2e batches match the already-compiled step graphs exactly."""

    def __init__(self, inner, num_answers: int):
        self.inner = inner
        self.num_answers = num_answers

    def __len__(self):
        return len(self.inner)

    def question_ids(self, idx):
        return self.inner.question_ids(idx)

    def get_batch(self, idx):
        b = self.inner.get_batch(idx)
        t = b["target"]
        out = np.zeros((t.shape[0], self.num_answers), t.dtype)
        out[:, : t.shape[1]] = t
        b["target"] = out
        return b


def _e2e_dataset(cfg):
    """Synthetic GQA corpus converted to the native xpack format, cached in
    .bench_data/ across runs."""
    from xggm_tpu.data.datasets import GQADataset, GraphBatchDataset
    from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab
    from xggm_tpu.data.tokenizer import BertTokenizer
    from xggm_tpu.data.xpack import XPackFeatureStore, convert_h5_to_xpack
    from xggm_tpu.config import DataConfig

    root = os.path.join(HERE, ".bench_data")
    pack = os.path.join(root, "train_obj36.xpack")
    if not os.path.exists(pack):
        make_synthetic_gqa(root, "train", n_images=E2E_IMAGES,
                           n_questions=E2E_QUESTIONS, feat_dim=2048)
        feat = os.path.join(root, "gqa_imgfeat")
        convert_h5_to_xpack(
            os.path.join(feat, "train_obj36.h5"),
            os.path.join(feat, "train_obj36_info.json"),
            os.path.join(feat, "train_obj36_adj_v2.h5"),
            pack, feat_dim=2048)
        write_vocab(os.path.join(root, "vocab.txt"))

    tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
    dset = GQADataset("train", DataConfig(data_root=root))
    gbd = GraphBatchDataset(dset, tok, store=XPackFeatureStore(pack))
    return _PadTargets(gbd, cfg.num_answers)


def _wait_for_tpu(max_wait_s: float = 1800.0) -> None:
    """Block until the TPU backend answers, or raise.

    The axon relay can go down entirely; a bare jax.devices() then hangs
    ~25-30 min in backend init before erroring (observed round 3). Probe in
    short-lived subprocesses (backend init is once-per-process, so a failed
    probe can't poison this process) and retry with backoff so a transient
    outage doesn't cost the round its bench record.
    """
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=300)
            if probe.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            raise RuntimeError(
                f"TPU backend unreachable after {attempt} probes over "
                f"{max_wait_s:.0f}s - the relay is down; re-run bench.py "
                "when it recovers")
        print(f"# TPU backend not answering (probe {attempt}); retrying",
              flush=True)
        time.sleep(min(60.0, max(5.0, deadline - time.time())))


def main():
    _wait_for_tpu()
    import jax
    # rbg PRNG: dropout-mask generation is ~13% of the threefry step time on
    # v5e; rbg is the TPU-native generator (tools/perf_probe.py measurements)
    jax.config.update("jax_default_prng_impl", "rbg")
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from xggm_tpu.config import gqa_ood_config
    from xggm_tpu.data.feeder import Feeder
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import (
        TrainState, bf16_param_shadow, make_ggm_train_step)
    from __graft_entry__ import _make_batch

    import dataclasses

    cfg = gqa_ood_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(
        dtype="bfloat16",
        bert=dataclasses.replace(cfg.lxmert.bert,
                                 use_pallas_attention=True)))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)

    import jax.numpy as jnp

    bs = cfg.train.batch_size  # 96, the shipped recipe (script/gqa_ood.sh)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, bs, cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    # bf16 compute -> bf16 feature transfer (same host-side cast the trainer
    # feeder performs; halves the dominant host->device bytes)
    batch["feats"] = batch["feats"].astype(jnp.bfloat16)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    # downstream params at 4x the encoder lr (reference gqa_ood.py:122-133)
    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    # fused=False: the single-pass Pallas BertAdam (ops/pallas_optim.py) is
    # available but measured perf-neutral-to-slightly-slower in the full step
    # (95.9 ms vs 93.6 ms) - its 132 per-leaf kernel launches offset the
    # bandwidth savings at this parameter count
    tx = bert_adam(lr=4 * 5e-6, warmup=0.1, t_total=10_000, lr_scale=scales)
    # bf16 param shadow (cfg.train.bf16_params, the trainer default): steps
    # read weights as bf16, halving weight-read bytes; masters stay fp32
    state = TrainState(params, tx.init(params), bf16_param_shadow(params))

    steps = {br: make_ggm_train_step(model, tx, cfg.train, br)
             for br in ("relation", "representation")}
    batch = jax.device_put(batch)

    # Warmup / compile both branches. NOTE: a host readback (not
    # block_until_ready) is the only reliable execution barrier through the
    # axon TPU relay.
    state, m = steps["relation"](state, batch, jax.random.PRNGKey(0))
    float(m["clean_loss"])
    state, m = steps["representation"](state, batch, jax.random.PRNGKey(0))
    float(m["clean_loss"])

    # ---- phase 1: steady-state step throughput (cached input) ----
    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = steps["relation"](state, batch,
                                           jax.random.PRNGKey(i + 1))
    final_loss = float(metrics["clean_loss"])  # syncs the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), "non-finite loss in bench run"
    step_pairs_per_sec = bs * n_iters / dt

    # ---- phase 2: end-to-end with the real input pipeline ----
    gbd = _e2e_dataset(cfg)
    host_rng = random.Random(0)
    feeder = Feeder(gbd, bs, shuffle=True, drop_last=True, seed=0,
                    feats_dtype=jnp.bfloat16)
    # one warmup pass over a couple of batches (fresh shapes already match)
    it = iter(feeder)
    _, b0, _ = next(it)
    state, m = steps["relation"](state, b0, jax.random.PRNGKey(0))
    float(m["clean_loss"])
    del it

    # host assembly rate alone: proves the input pipeline outruns the step
    idx = np.arange(len(gbd))
    t0 = time.perf_counter()
    for i in range(8):
        gbd.get_batch(idx[(i * 37) % max(1, len(gbd) - bs):][:bs])
    asm_pairs_per_sec = bs * 8 / (time.perf_counter() - t0)

    n_e2e = 0
    t0 = time.perf_counter()
    for qids, dbatch, _mask in feeder:  # one epoch over the corpus
        br = "relation" if host_rng.randint(1, 10) <= cfg.ggm.delta \
            else "representation"
        state, metrics = steps[br](state, dbatch, jax.random.PRNGKey(n_e2e))
        n_e2e += 1
    final_loss = float(metrics["clean_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), "non-finite loss in e2e run"
    e2e_pairs_per_sec = bs * n_e2e / dt

    # ---- phase 3: fresh-data rotation with the corpus pre-staged in HBM ----
    # Separates the axon relay's host->device limit from the training path:
    # every step consumes a DIFFERENT real corpus batch (no cached-input
    # reuse, full branch mix), but the transfers happened up front. On a
    # normal PCIe host the feeder achieves this overlap live (host assembly
    # outruns the step rate); here it proves the step pipeline itself has no
    # hidden per-fresh-batch cost (no retraces, no layout churn).
    idx = np.arange(len(gbd))
    staged = []
    for i in range(12):
        b = gbd.get_batch(idx[(i * 53) % max(1, len(gbd) - bs):][:bs])
        b["feats"] = b["feats"].astype(jnp.bfloat16)
        staged.append(jax.device_put(b))
    state, m = steps["relation"](state, staged[0], jax.random.PRNGKey(0))
    float(m["clean_loss"])
    n_rot = 30
    t0 = time.perf_counter()
    for i in range(n_rot):
        br = "relation" if host_rng.randint(1, 10) <= cfg.ggm.delta \
            else "representation"
        state, metrics = steps[br](state, staged[(i + 1) % len(staged)],
                                   jax.random.PRNGKey(i))
    final_loss = float(metrics["clean_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), "non-finite loss in rotation run"
    rot_pairs_per_sec = bs * n_rot / dt

    # peak HBM (bytes) if the backend exposes it - documents batch headroom
    # (the axon relay device reports no memory_stats; omit rather than 0)
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)() or {}
    hbm = ({"peak_hbm_gb": round(stats["peak_bytes_in_use"] / 2**30, 2)}
           if "peak_bytes_in_use" in stats else {})

    # ---- phase 4 (best-effort): the two non-flagship workloads ----
    # pretrain (reference lxmert_pretrain.py per-batch work, bs 256) and
    # test-arm inference (bs 512) via tools/workload_probe.py in a clean
    # subprocess; on any failure the keys simply don't appear.
    other = {}
    try:
        import subprocess
        import sys as _sys
        proc = subprocess.run(
            [_sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "workload_probe.py"), "--iters", "10"],
            capture_output=True, text=True, timeout=1500)
        if proc.returncode == 0:
            # the probe prints one compact JSON line; take the LAST line
            # starting with '{' so stray stdout (library warnings, future
            # prints) before or after it can't break the parse
            blob = [ln for ln in proc.stdout.splitlines()
                    if ln.lstrip().startswith("{")][-1]
            probe = json.loads(blob)
            for k in ("pretrain_sents_per_sec", "pretrain_bs",
                      "inference_pairs_per_sec", "inference_bs"):
                if k in probe:
                    other[k] = probe[k]
        else:
            print("bench phase 4 (workload probe) failed rc="
                  f"{proc.returncode}: {proc.stderr[-500:]}",
                  file=_sys.stderr)
    except Exception as e:  # keep the headline JSON line intact regardless
        import sys as _sys
        print(f"bench phase 4 (workload probe) skipped: {e!r}",
              file=_sys.stderr)

    # ---- phase 5 (best-effort): batch-size scaling sweep ----
    # The bs 96 recipe is the reference's (script/gqa_ood.sh); larger
    # batches amortize the optimizer cost (docs/PERF.md batch-scaling
    # table). Measured via tools/perf_probe.py full-step variant in clean
    # subprocesses. `--prng rbg` is hard-coded: threefry dropout masks cost
    # ~40 ms at bs 192+, so a sweep without it reads as a fake regression
    # (CLAUDE.md round-3 trap). Probe numbers run ~9% above the bench loop
    # (different sync cadence) - bs 96 is probed too as a same-basis anchor.
    batch_scaling = {}
    for sweep_bs in (96, 192, 384):
        try:
            import subprocess
            import sys as _sys
            proc = subprocess.run(
                [_sys.executable,
                 os.path.join(HERE, "tools", "perf_probe.py"),
                 "--variants", "step", "--prng", "rbg",
                 "--bs", str(sweep_bs), "--iters", "12"],
                capture_output=True, text=True, timeout=1800)
            if proc.returncode == 0:
                # perf_probe ends with a (possibly multi-line) JSON object;
                # parse from the LAST line that opens one
                lines = proc.stdout.splitlines()
                start = max(i for i, ln in enumerate(lines)
                            if ln.lstrip().startswith("{"))
                ms = json.loads("\n".join(lines[start:]))["step"]
                batch_scaling[str(sweep_bs)] = round(sweep_bs / (ms / 1e3), 1)
            else:
                print(f"bench phase 5 (bs {sweep_bs}) failed rc="
                      f"{proc.returncode}: {proc.stderr[-300:]}",
                      file=_sys.stderr)
        except Exception as e:
            import sys as _sys
            print(f"bench phase 5 (bs {sweep_bs}) skipped: {e!r}",
                  file=_sys.stderr)
    if batch_scaling:
        other["batch_scaling_pairs_per_sec"] = batch_scaling
        other["batch_scaling_note"] = (
            "perf_probe full-step basis (~9% above the bench loop), rbg "
            "PRNG; keyed by batch size")

    value = round(step_pairs_per_sec, 2)  # per chip; bench runs on one chip
    print(json.dumps({
        "metric": "train_qa_pairs_per_sec_per_chip",
        "value": value,
        "unit": "QA pairs/s/chip (LXMERT+GGM two-phase fwd/bwd, bs 96, bf16)",
        "vs_baseline": round(value / BASELINE, 3),
        "e2e_pairs_per_sec": round(e2e_pairs_per_sec, 2),
        "e2e_staged_rotation_pairs_per_sec": round(rot_pairs_per_sec, 2),
        "e2e_host_assembly_pairs_per_sec": round(asm_pairs_per_sec, 2),
        "e2e_batches": n_e2e,
        **hbm,
        **other,
        "e2e_note": ("e2e is bound by the axon relay's ~15 MB/s host->device "
                     "link in this environment; host assembly outruns the "
                     "step rate, so on a real TPU host (PCIe, GB/s) e2e "
                     "converges to the step number"),
    }))


if __name__ == "__main__":
    main()
