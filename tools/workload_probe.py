"""Throughput of the two non-flagship workloads on the real chip:

  pretrain   : LXMERT multi-task pretraining step (masked LM + matched +
               obj/attr/feat prediction + QA; reference
               run_lxmert_pretraining bs 256, src/pretrain/lxmert_pretrain.py)
  inference  : the test-arm forward (encoder + answer head only, GGM absent
               at inference - reference gqa_ood.py:379-396, bs 512)
  inference_int8 : the same forward through the serving int8 PTQ path
               (serving/quant.py: per-channel int8 Dense kernels + dynamic
               per-row int8 activations; v5e MXU int8 runs 2x bf16)

Device-resident batches; every timing ends with a host readback (the axon
relay's only reliable barrier). Prints one JSON dict.

Run: python tools/workload_probe.py [--variants pretrain,inference]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="pretrain,inference")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pretrain_bs", type=int, default=256)
    ap.add_argument("--bf16_params", type=int, default=1,
                    help="carry the bf16 param shadow in the pretrain "
                         "step (config.train.bf16_params); 0 to bisect")
    ap.add_argument("--infer_bs", type=int, default=512)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder activations in the pretrain "
                         "step (config.lxmert.remat)")
    ap.add_argument("--accum", type=int, default=1,
                    help="pretrain gradient accumulation (train.accum_steps)"
                         ": times one full group (N grad folds + 1 update)")
    args = ap.parse_args()
    variants = args.variants.split(",")

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from xggm_tpu.config import gqa_ood_config, TrainConfig
    results = {}

    if "pretrain" in variants:
        from xggm_tpu.data.pretrain_data import (
            LxmertPretrainDataset, PretrainFeaturizer)
        from xggm_tpu.data.synthetic_pretrain import make_synthetic_pretrain
        from xggm_tpu.data.tokenizer import BertTokenizer
        from xggm_tpu.training.pretrainer import LxmertPretrainer

        bs = args.pretrain_bs
        root = os.path.join(tempfile.gettempdir(), "xggm_pt_probe")
        if not os.path.exists(os.path.join(root, "vocab.txt")):
            make_synthetic_pretrain(root, n_images=max(64, bs // 3),
                                    sents_per_img=3, feat_dim=2048)
        ds = LxmertPretrainDataset("mscoco_train", root)
        ds.load_features_h5(
            os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36.h5"),
            os.path.join(root, "lxmert_imgfeat",
                         "mscoco_train_obj36_info.json"))
        tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
        feat = PretrainFeaturizer(ds, tok, max_seq_length=20,
                                  task_matched=True, seed=0)
        cfg = gqa_ood_config(
            output=os.path.join(root, "out"),
            train=TrainConfig(batch_size=bs, lr=1e-4, epochs=1,
                              bf16_params=bool(args.bf16_params),
                              accum_steps=args.accum))
        cfg = cfg.replace(lxmert=cfg.lxmert.replace(
            dtype="bfloat16",
            remat=args.remat,
            bert=dataclasses.replace(cfg.lxmert.bert,
                                     use_pallas_attention=True)))
        pt = LxmertPretrainer(cfg, feat)
        idx = np.arange(len(feat))
        batch, _ = feat.featurize(
            list(np.resize(idx, bs)))
        batch["feats"] = batch["feats"].astype(jnp.bfloat16)
        batch = jax.device_put(batch)

        if args.accum > 1:
            # one full accumulation group = accum grad folds + one update
            from xggm_tpu.training.steps import _apply_params

            def group(state, seed):
                acc = pt.zero_acc(_apply_params(state))
                for j in range(args.accum):
                    acc, loss, _, _ = pt.grad_step(
                        acc, _apply_params(state), batch,
                        jax.random.PRNGKey(seed * args.accum + j))
                return pt.apply_step(state, acc), loss

            state, loss = group(pt.state, 0)
            float(loss)  # compile + sync
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, loss = group(state, 1 + i)
            float(loss)
            dt = (time.perf_counter() - t0) / args.iters
            results["pretrain_group_ms"] = round(dt * 1e3, 2)
            results["pretrain_sents_per_sec"] = round(
                bs * args.accum / dt, 2)
            results["pretrain_bs"] = bs
            results["pretrain_accum"] = args.accum
        else:
            state, loss, losses, preds = pt.train_step(
                pt.state, batch, jax.random.PRNGKey(0))
            float(loss)  # compile + sync
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, loss, losses, preds = pt.train_step(
                    state, batch, jax.random.PRNGKey(i))
            float(loss)
            dt = (time.perf_counter() - t0) / args.iters
            results["pretrain_step_ms"] = round(dt * 1e3, 2)
            results["pretrain_sents_per_sec"] = round(bs / dt, 2)
            results["pretrain_bs"] = bs
        try:  # peak HBM (unsupported on some relay backends)
            ms = jax.local_devices()[0].memory_stats()
            results["pretrain_peak_hbm_gb"] = round(
                ms.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            pass

    if "inference" in variants or "inference_int8" in variants:
        from xggm_tpu.models.task_model import XGGMModel
        from __graft_entry__ import _make_batch

        bs = args.infer_bs
        cfg = gqa_ood_config()
        cfg = cfg.replace(lxmert=cfg.lxmert.replace(
            dtype="bfloat16",
            bert=dataclasses.replace(cfg.lxmert.bert,
                                     use_pallas_attention=True)))
        model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
        rng = np.random.RandomState(0)
        batch = _make_batch(rng, bs, cfg.lxmert.bert.vocab_size,
                            cfg.lxmert.visual.visual_feat_dim,
                            cfg.num_answers)
        batch["feats"] = batch["feats"].astype(jnp.bfloat16)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch["input_ids"], batch["input_mask"], batch["segment_ids"],
            batch["feats"], batch["boxes"], batch["adj"],
            jax.random.PRNGKey(2), method=XGGMModel.init_all)
        batch = jax.device_put(batch)

        @jax.jit
        def infer(params, b):
            logits = model.apply(
                params, b["input_ids"], b["input_mask"], b["segment_ids"],
                b["feats"], b["boxes"], deterministic=True,
                method=XGGMModel.clean_forward)
            return jnp.argmax(logits, axis=-1)

        masters = params

        if "inference" in variants:
            # production predict path (trainer.predict): eval from the bf16
            # shadow overlaid on the masters - same operand values the model
            # casts to at use, half the weight-read bytes
            from xggm_tpu.training.steps import (
                TrainState, _apply_params, bf16_param_shadow)
            if args.bf16_params:
                params = _apply_params(TrainState(
                    params, None, bf16_param_shadow(params)))

            preds = infer(params, batch)
            int(np.asarray(preds)[0])  # compile + sync
            t0 = time.perf_counter()
            for _ in range(args.iters):
                preds = infer(params, batch)
            int(np.asarray(preds)[0])
            dt = (time.perf_counter() - t0) / args.iters
            results["inference_step_ms"] = round(dt * 1e3, 2)
            results["inference_pairs_per_sec"] = round(bs / dt, 2)
            results["inference_bs"] = bs

        if "inference_int8" in variants:
            # serving int8 PTQ path (xggm-export --quantize int8): same
            # graph the exported artifact runs
            from xggm_tpu.serving.quant import (intercepted_apply,
                                                quantize_dense_params)

            q_params, n_q = quantize_dense_params(jax.device_get(masters))
            q_params = jax.device_put(q_params)

            @jax.jit
            def infer_q(qp, b):
                logits = intercepted_apply(
                    model, qp, b["input_ids"], b["input_mask"],
                    b["segment_ids"], b["feats"], b["boxes"],
                    deterministic=True, method=XGGMModel.clean_forward)
                return jnp.argmax(logits, axis=-1)

            preds_q = infer_q(q_params, batch)
            int(np.asarray(preds_q)[0])  # compile + sync
            t0 = time.perf_counter()
            for _ in range(args.iters):
                preds_q = infer_q(q_params, batch)
            int(np.asarray(preds_q)[0])
            dt = (time.perf_counter() - t0) / args.iters
            results["inference_int8_step_ms"] = round(dt * 1e3, 2)
            results["inference_int8_pairs_per_sec"] = round(bs / dt, 2)
            results["inference_int8_quantized_kernels"] = n_q
            results["inference_int8_bs"] = bs

    # one compact line: bench.py scrapes the last stdout line starting '{'
    print(json.dumps(results))


if __name__ == "__main__":
    main()
