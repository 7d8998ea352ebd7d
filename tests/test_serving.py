"""Serving artifacts (xggm_tpu/serving): jax.export roundtrips, padding,
symbolic batch, model-code-free loading, and the HTTP server end-to-end.

The reference has no serving subsystem (its test arm is an offline predict
loop, src/gqa/gqa_ood.py:379-403); these tests pin the TPU-native
deployment path: artifact == compiled graph + weights + answer vocab.
"""
import json
import os
import subprocess
import sys
import time
import urllib.request

import jax
import numpy as np
import pytest

from xggm_tpu.config import tiny_test_config
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.serving import export_model, ServingModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tiny(dtype="float32"):
    cfg = tiny_test_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(dtype=dtype))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    from __graft_entry__ import _make_batch
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, 8, cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    serve_batch = {k: batch[k] for k in ("input_ids", "input_mask",
                                         "segment_ids", "feats", "boxes")}
    return cfg, model, params, serve_batch


def _direct_logits(model, params, batch):
    return np.asarray(model.apply(
        params, batch["input_ids"], batch["input_mask"],
        batch["segment_ids"], batch["feats"], batch["boxes"],
        deterministic=True, method=XGGMModel.clean_forward),
        dtype=np.float32)


def test_export_roundtrip_fp32(tmp_path):
    cfg, model, params, batch = _tiny("float32")
    art = str(tmp_path / "art")
    export_model(model, params, art, batch_size=8,
                 label2ans=[f"a{i}" for i in range(cfg.num_answers)],
                 platforms=("cpu",), bf16_weights=False)
    sm = ServingModel.load(art)
    got = sm.predict_logits(batch)
    want = _direct_logits(model, params, batch)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    answers = sm.predict_answers(batch)
    assert answers == [f"a{i}" for i in np.argmax(want, -1)]


def test_export_bf16_shadow_layout(tmp_path):
    """Default export carries the bf16 weight layout trainer.predict reads:
    Dense kernels stored as bf16 (half artifact size), LayerNorm/embeddings
    fp32; outputs agree with the direct fp32-param graph at bf16 level."""
    cfg, model, params, batch = _tiny("bfloat16")
    art = str(tmp_path / "art_bf16")
    export_model(model, params, art, batch_size=8, platforms=("cpu",))
    meta = json.load(open(os.path.join(art, "meta.json")))
    dt = meta["param_dtypes"]
    assert any(v == "bfloat16" for v in dt.values())  # dense kernels
    ln = [k for k in dt if "LayerNorm" in k or "layernorm" in k.lower()]
    assert ln and all(dt[k] == "float32" for k in ln)
    sm = ServingModel.load(art)
    got = sm.predict_logits(batch)
    want = _direct_logits(model, params, batch)
    # bf16-rounding-level envelope (same as tests/test_bf16_shadow.py)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    assert not np.allclose(got, 0)


def test_ragged_batch_padding(tmp_path):
    cfg, model, params, batch = _tiny("float32")
    art = str(tmp_path / "art")
    export_model(model, params, art, batch_size=8, platforms=("cpu",),
                 bf16_weights=False)
    sm = ServingModel.load(art)
    full = sm.predict_logits(batch)
    short = {k: v[:5] for k, v in batch.items()}
    got = sm.predict_logits(short)
    assert got.shape[0] == 5
    np.testing.assert_allclose(got, full[:5], rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError):
        sm.predict_logits({k: np.concatenate([v, v]) for k, v in batch.items()})


def test_symbolic_batch_export(tmp_path):
    """batch_size=None exports a shape-polymorphic graph: any batch size
    runs (one XLA compile per concrete shape)."""
    cfg, model, params, batch = _tiny("float32")
    art = str(tmp_path / "art_sym")
    export_model(model, params, art, batch_size=None, platforms=("cpu",),
                 bf16_weights=False)
    sm = ServingModel.load(art)
    assert sm.batch_size is None
    want = _direct_logits(model, params, batch)
    for n in (3, 8):
        got = sm.predict_logits({k: v[:n] for k, v in batch.items()})
        np.testing.assert_allclose(got, want[:n], rtol=1e-5, atol=1e-5)


def test_serving_without_model_code(tmp_path):
    """The artifact loads and predicts in a process that never imports the
    model code - flax and xggm_tpu.models must stay out of sys.modules."""
    cfg, model, params, batch = _tiny("float32")
    art = str(tmp_path / "art")
    export_model(model, params, art, batch_size=8, platforms=("cpu",),
                 bf16_weights=False)
    np.savez(tmp_path / "inputs.npz", **batch)
    np.save(tmp_path / "want.npy", _direct_logits(model, params, batch))
    script = tmp_path / "serve_only.py"
    script.write_text(f"""
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from xggm_tpu.serving import ServingModel

sm = ServingModel.load({str(art)!r})
batch = dict(np.load({str(tmp_path / 'inputs.npz')!r}))
got = sm.predict_logits(batch)
want = np.load({str(tmp_path / 'want.npy')!r})
np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
banned = [m for m in sys.modules
          if m.startswith('flax') or m.startswith('xggm_tpu.models')
          or m.startswith('xggm_tpu.training')]
assert not banned, f'model/training code leaked into serving: {{banned}}'
print('MODEL_FREE_OK')
""")
    proc = subprocess.run([sys.executable, str(script)], cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MODEL_FREE_OK" in proc.stdout


def test_http_server_end_to_end(tmp_path):
    """xggm-export then xggm-serve on a synthetic GQA corpus: healthz,
    /predict answers, chunking past the exported batch, error paths."""
    data_root = str(tmp_path / "data")
    art = str(tmp_path / "art")
    env = {**os.environ, "JAX_COMPILATION_CACHE_DIR":
           os.path.join(REPO, "tests", ".jax_cache")}
    proc = subprocess.run(
        [sys.executable, "-m", "xggm_tpu.cli.export",
         "--synthetic", "--device", "cpu", "--task", "gqa",
         "--data_root", data_root, "--valid", "val",
         "--output", str(tmp_path / "snap"),
         "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
         "--artifact", art, "--serve_bs", "4", "--platforms", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=1500, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "exported artifact" in proc.stdout

    port = 18471
    server = subprocess.Popen(
        [sys.executable, "-m", "xggm_tpu.cli.serve",
         "--artifact", art, "--task", "gqa", "--data_root", data_root,
         "--split", "val", "--device", "cpu", "--port", str(port)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    base = f"http://127.0.0.1:{port}"
    try:
        health = None
        for _ in range(120):
            if server.poll() is not None:
                raise AssertionError(
                    f"server died: {server.stderr.read().decode()[-2000:]}")
            try:
                health = json.load(urllib.request.urlopen(
                    base + "/healthz", timeout=5))
                break
            except OSError:
                time.sleep(1)
        assert health and health["status"] == "ok" and \
            health["batch_size"] == 4

        # 6 queries > serve_bs 4: exercises server-side chunking + padding
        queries = [{"img_id": f"synth_val_{i % 3}",
                    "sent": f"what color is the object {i} ?"}
                   for i in range(6)]
        req = urllib.request.Request(
            base + "/predict",
            data=json.dumps({"queries": queries}).encode(),
            headers={"Content-Type": "application/json"})
        resp = json.load(urllib.request.urlopen(req, timeout=600))
        from xggm_tpu.data.synthetic import ANSWERS
        assert len(resp["answers"]) == 6
        assert all(a in ANSWERS for a in resp["answers"])
        assert resp["latency_ms"] > 0

        # malformed request -> 400 JSON error, server keeps serving
        bad = urllib.request.Request(base + "/predict", data=b"{}",
                                     headers={"Content-Type":
                                              "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "error" in json.load(e)
        health = json.load(urllib.request.urlopen(base + "/healthz",
                                                  timeout=30))
        assert health["status"] == "ok"
    finally:
        server.terminate()
        server.wait(timeout=30)


# ---------------------------------------------------------------------------
# int8 quantized export (serving/quant.py) - TPU-side extra capability, the
# reference has no quantized deployment path.

def test_quantize_kernel_roundtrip():
    from xggm_tpu.serving.quant import quantize_kernel

    rng = np.random.RandomState(0)
    w = rng.randn(64, 48).astype(np.float32)
    w_q, scale = quantize_kernel(w)
    assert w_q.dtype == np.int8 and scale.shape == (48,)
    # symmetric per-channel: dequant error bounded by half a quant step
    np.testing.assert_allclose(w_q.astype(np.float32) * scale, w,
                               atol=float(scale.max()) / 2 + 1e-7)
    # a zero column must not produce NaN scales
    w[:, 0] = 0
    w_q0, scale0 = quantize_kernel(w)
    assert np.isfinite(scale0).all() and (w_q0[:, 0] == 0).all()


def test_int8_dense_interceptor_numerics():
    """A quantized Dense through the intercept hook matches x @ W + b to
    int8 precision (per-channel weights + dynamic per-row activations)."""
    import flax.linen as nn

    from xggm_tpu.serving.quant import (intercepted_apply,
                                        quantize_dense_params)

    rng = np.random.RandomState(1)
    x = rng.randn(16, 64).astype(np.float32)
    dense = nn.Dense(80)
    params = dense.init(jax.random.PRNGKey(0), x)
    want = np.asarray(dense.apply(params, x))
    q_params, n_q = quantize_dense_params(jax.device_get(params),
                                          exclude=())
    assert n_q == 1
    got = np.asarray(intercepted_apply(dense, q_params, x))
    # int8 x int8 keeps ~2 decimal digits; check relative Frobenius error
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_export_int8(tmp_path):
    cfg, model, params, batch = _tiny("float32")
    art = str(tmp_path / "art_int8")
    export_model(model, params, art, batch_size=8, platforms=("cpu",),
                 bf16_weights=False, quantize="int8",
                 label2ans=[f"a{i}" for i in range(cfg.num_answers)])
    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["quantize"] == "int8"
    dt = meta["param_dtypes"]
    int8_kernels = [k for k in dt if k.endswith("/kernel") and dt[k] == "int8"]
    scales = [k for k in dt if k.endswith("kernel_scale_int8")]
    assert len(int8_kernels) == len(scales) > 10
    # the logits layer is excluded by default (standard PTQ practice)
    fc2 = [k for k in dt if "fc2" in k and k.endswith("/kernel")]
    assert fc2 and all(dt[k] == "float32" for k in fc2)

    sm = ServingModel.load(art)
    got = sm.predict_logits(batch)
    want = _direct_logits(model, params, batch)
    # int8-PTQ envelope: small relative error on the logit vectors and
    # agreement of the predicted answers
    rel = (np.linalg.norm(got - want, axis=-1)
           / np.linalg.norm(want, axis=-1))
    assert rel.max() < 0.05, rel
    assert (np.argmax(got, -1) == np.argmax(want, -1)).mean() >= 0.9


def test_int8_accuracy_through_official_eval(tmp_path):
    """VERDICT r4 item 5: the number a deployer needs - end-to-end ACCURACY
    through the official GQA evaluator (evals/gqa_eval.GQAEval), fp32 vs
    int8 exported artifacts on a labeled synthetic eval fixture.

    A tiny model is trained to high accuracy on a learnable corpus (the
    blind-parity corpus: answer word planted in the question text + a
    visual-feature column bump), both artifacts are exported and driven
    through ServingModel -> GQA-challenge prediction JSONs -> GQAEval, and
    the int8 accuracy delta is pinned. docs/SERVING.md quotes the measured
    number."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import blind_parity as bp
    from xggm_tpu.config import DataConfig, tiny_test_config
    from xggm_tpu.data.datasets import GQADataset, GraphBatchDataset
    from xggm_tpu.data.tokenizer import BertTokenizer
    from xggm_tpu.evals.gqa_eval import GQAEval
    from xggm_tpu.training.bert_adam import bert_adam
    from xggm_tpu.training.steps import (TrainState, make_clean_train_step)

    import dataclasses

    root = bp.make_corpus(str(tmp_path), "gqa")
    cfg = tiny_test_config()
    # the blind-parity corpus ships real-width 2048-d features; the config
    # must agree (export_model sizes the example inputs from it)
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(
        visual=dataclasses.replace(cfg.lxmert.visual,
                                   visual_feat_dim=2048)))
    dset = GQADataset("train", DataConfig(data_root=root))
    tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
    gbd = GraphBatchDataset(dset, tok)
    model = XGGMModel(cfg.lxmert, cfg.ggm, dset.num_answers)

    bs, n_steps = 16, 60
    idx0 = np.arange(len(gbd))
    b0 = gbd.get_batch(idx0[:bs])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b0["input_ids"], b0["input_mask"], b0["segment_ids"],
        b0["feats"], b0["boxes"], b0["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    tx = bert_adam(lr=1e-3, warmup=0.1, t_total=4 * n_steps)
    step = make_clean_train_step(model, tx, cfg.train, dset.num_answers)
    state = TrainState(params, tx.init(params))
    rng = np.random.RandomState(0)
    for i in range(n_steps):
        sel = rng.permutation(len(gbd))[:bs]
        state, m = step(state, gbd.get_batch(sel), jax.random.PRNGKey(i))
    assert np.isfinite(float(m["clean_loss"]))
    params = state.params

    # export both artifacts
    arts = {}
    for kind, quant in (("fp32", None), ("int8", "int8")):
        path = str(tmp_path / f"art_{kind}")
        export_model(model, params, path, batch_size=bs, platforms=("cpu",),
                     bf16_weights=False, quantize=quant,
                     label2ans=dset.label2ans)
        arts[kind] = ServingModel.load(path)

    # official-eval fixture: every eval question with its gold answer
    questions, acc = {}, {}
    order = np.arange(len(gbd))
    qids = gbd.question_ids(order)
    for qid in qids:
        rec = dset.id2datum[qid]
        gold = max(rec["label"], key=rec["label"].get)
        questions[str(qid)] = {
            "answer": gold, "isBalanced": True,
            "question": rec["sent"],
            "types": {"structural": "query", "semantic": "attr",
                      "detailed": "x"},
            "groups": {"global": "color"},
            "semantic": [{"operation": "select", "argument": "thing"}],
        }
    qfile = tmp_path / "questions.json"
    qfile.write_text(json.dumps(questions))

    for kind, sm in arts.items():
        preds = []
        for start in range(0, len(gbd), bs):
            sel = order[start:start + bs]
            batch = gbd.get_batch(sel)
            batch = {k: batch[k] for k in ("input_ids", "input_mask",
                                           "segment_ids", "feats", "boxes")}
            # predict_answers pads ragged tails internally and trims back
            answers = sm.predict_answers(batch)
            for qid, ans in zip(gbd.question_ids(sel), answers):
                preds.append({"questionId": str(qid), "prediction": ans})
        pfile = tmp_path / f"preds_{kind}.json"
        pfile.write_text(json.dumps(preds))
        ev = GQAEval(str(pfile), str(qfile))
        acc[kind] = ev.get_acc_result()["accuracy"]

    # the model learned the task (meaningful margins for the delta to act
    # on), and int8 PTQ costs at most 2 accuracy points end-to-end
    print(f"official-eval accuracy fp32={acc['fp32']:.2f} "
          f"int8={acc['int8']:.2f} delta={acc['fp32'] - acc['int8']:.2f}")
    assert acc["fp32"] > 60.0, acc
    delta = acc["fp32"] - acc["int8"]
    assert abs(delta) <= 2.0, acc
