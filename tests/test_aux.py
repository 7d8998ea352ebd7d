"""Aux subsystems: VQA annotation API, file cache, TF bridge mapping,
profiling hooks."""
import json
import os

import numpy as np
import pytest

from xggm_tpu.evals.vqa_api import VQAAnnotations
from xggm_tpu.utils.file_cache import (
    cached_path, cache_put, url_to_filename,
)


def _write_annotations(path, n=6):
    anns = []
    for q in range(n):
        anns.append({
            "question_id": q,
            "image_id": q % 3,
            "question_type": "what" if q % 2 else "is",
            "answer_type": "other" if q % 2 else "yes/no",
            "answers": [{"answer": "yes", "answer_id": k + 1}
                        for k in range(10)],
        })
    with open(path, "w") as f:
        json.dump(anns, f)
    return anns


def test_vqa_annotations_api(tmp_path):
    ann_file = str(tmp_path / "anns.json")
    _write_annotations(ann_file)
    vqa = VQAAnnotations(ann_file)
    assert len(vqa.get_ques_ids()) == 6
    assert set(vqa.get_ques_ids(img_ids=[0])) == {0, 3}
    assert set(vqa.get_ques_ids(ques_types=["what"])) == {1, 3, 5}
    assert set(vqa.get_img_ids(ques_ids=[0, 1])) == {0, 1}

    res_file = str(tmp_path / "res.json")
    with open(res_file, "w") as f:
        json.dump([{"question_id": q, "answer": "yes"} for q in range(6)], f)
    res = vqa.load_res(res_file)
    assert res.qa[0]["answer"] == "yes"
    assert res.qa[0]["answer_type"] == "yes/no"

    # end-to-end with the official evaluator (vqaEvalDemo.py flow)
    from xggm_tpu.evals.vqa_eval import VQAOfficialEval
    ev = VQAOfficialEval(vqa.dataset, res.dataset)
    assert ev.evaluate(vqa.get_ques_ids())["overall"] == pytest.approx(100.0)


def test_file_cache_offline(tmp_path, monkeypatch):
    """Zero-egress behavior: unreachable URLs fall back to the staged
    etag-less cache entry; a true miss raises with the staging recipe."""
    from xggm_tpu.utils import file_cache

    # simulate no egress deterministically (no DNS timeout dependence)
    monkeypatch.setattr(file_cache, "_http_etag",
                        lambda url, timeout: (_ for _ in ()).throw(
                            OSError("network unreachable")))
    cache = str(tmp_path / "cache")
    src = tmp_path / "weights.bin"
    src.write_bytes(b"abc123")
    url = "https://example.com/bert/model.bin"
    # miss -> informative error naming the staging helper
    with pytest.raises(FileNotFoundError, match="cache_put"):
        cached_path(url, cache_dir=cache)
    # put + hit
    cache_put(str(src), url, cache_dir=cache)
    hit = cached_path(url, cache_dir=cache)
    assert open(hit, "rb").read() == b"abc123"
    assert os.path.basename(hit) == url_to_filename(url)
    # plain local path passthrough
    assert cached_path(str(src), cache_dir=cache) == str(src)
    # s3 without boto3: cache-only path, same staging fallback
    s3url = "s3://bucket/model.bin"
    cache_put(str(src), s3url, cache_dir=cache)
    assert open(cached_path(s3url, cache_dir=cache), "rb").read() == b"abc123"


class _EtagHandler:
    """Local HTTP file server with ETag support (hermetic stand-in for the
    reference's HEAD-then-GET download protocol, file_utils.py:180-232)."""

    def __init__(self, payload: bytes, etag: str):
        import http.server
        import threading

        self.head_count = 0
        self.get_count = 0
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _serve(self, with_body):
                self.send_response(200)
                self.send_header("ETag", outer.etag)
                self.send_header("Content-Length", str(len(outer.payload)))
                self.end_headers()
                if with_body:
                    self.wfile.write(outer.payload)

            def do_HEAD(self):
                outer.head_count += 1
                self._serve(False)

            def do_GET(self):
                outer.get_count += 1
                self._serve(True)

            def log_message(self, *a):
                pass

        self.payload, self.etag = payload, etag
        self.server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/model.bin"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_file_cache_http_download(tmp_path):
    """Real HTTP download through the cache: ETag-keyed entry + metadata,
    second call served from cache (no new GET), ETag change re-downloads."""
    import json as jsonlib

    cache = str(tmp_path / "cache")
    srv = _EtagHandler(b"weights-v1", etag='"v1"')
    try:
        got = cached_path(srv.url, cache_dir=cache)
        assert open(got, "rb").read() == b"weights-v1"
        assert os.path.basename(got) == url_to_filename(srv.url, '"v1"')
        meta = jsonlib.load(open(got + ".json"))
        assert meta == {"url": srv.url, "etag": '"v1"'}
        assert (srv.head_count, srv.get_count) == (1, 1)

        # warm hit: HEAD revalidates the etag, no body transfer
        assert cached_path(srv.url, cache_dir=cache) == got
        assert (srv.head_count, srv.get_count) == (2, 1)

        # server content changes -> new etag -> fresh download, old kept
        srv.payload, srv.etag = b"weights-v2", '"v2"'
        got2 = cached_path(srv.url, cache_dir=cache)
        assert got2 != got and open(got2, "rb").read() == b"weights-v2"
        assert srv.get_count == 2
    finally:
        srv.close()


def test_tf_bridge_mapping():
    """Synthesize a TF-style var dict and verify it loads into
    BertTextModel."""
    import jax

    from xggm_tpu.checkpoint.tf_bridge import convert_tf_bert
    from xggm_tpu.checkpoint.torch_bridge import merge_into
    from xggm_tpu.config import BertConfig
    from xggm_tpu.models.lxmert import BertTextModel

    rng = np.random.RandomState(0)
    H, I, V = 32, 64, 50
    tf_vars = {
        "bert/embeddings/word_embeddings": rng.randn(V, H),
        "bert/embeddings/position_embeddings": rng.randn(64, H),
        "bert/embeddings/token_type_embeddings": rng.randn(2, H),
        "bert/embeddings/LayerNorm/gamma": np.ones(H),
        "bert/embeddings/LayerNorm/beta": np.zeros(H),
        "bert/pooler/dense/kernel": rng.randn(H, H),
        "bert/pooler/dense/bias": np.zeros(H),
    }
    for n in ("query", "key", "value"):
        tf_vars[f"bert/encoder/layer_0/attention/self/{n}/kernel"] = \
            rng.randn(H, H)
        tf_vars[f"bert/encoder/layer_0/attention/self/{n}/bias"] = np.zeros(H)
    for t, shape in [("attention/output/dense", (H, H)),
                     ("intermediate/dense", (H, I)),
                     ("output/dense", (I, H))]:
        tf_vars[f"bert/encoder/layer_0/{t}/kernel"] = rng.randn(*shape)
        tf_vars[f"bert/encoder/layer_0/{t}/bias"] = np.zeros(shape[1])
    for ln in ("attention/output/LayerNorm", "output/LayerNorm"):
        tf_vars[f"bert/encoder/layer_0/{ln}/gamma"] = np.ones(H)
        tf_vars[f"bert/encoder/layer_0/{ln}/beta"] = np.zeros(H)

    flat, missing = convert_tf_bert(tf_vars, num_layers=1)
    assert not missing
    assert flat["layer_0/attention/self/qkv/kernel"].shape == (H, 3 * H)

    cfg = BertConfig(vocab_size=V, hidden_size=H, num_attention_heads=4,
                     intermediate_size=I, max_position_embeddings=64)
    model = BertTextModel(cfg, num_layers=1)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        np.zeros((2, 10), np.int32))
    merged, unmatched = merge_into(params, flat)
    assert not unmatched, unmatched[:4]
    seq, pooled = model.apply(merged, np.ones((2, 10), np.int32))
    assert np.all(np.isfinite(np.asarray(pooled)))


def test_cli_prng_flag():
    """--prng selects the jax PRNG implementation (default rbg, the
    TPU-native dropout-bits generator)."""
    import jax

    from xggm_tpu.cli.common import build_parser, configure_prng

    prev = jax.config.jax_default_prng_impl
    try:
        args = build_parser().parse_args(["--prng", "threefry2x32"])
        configure_prng(args)
        assert jax.config.jax_default_prng_impl == "threefry2x32"
        assert build_parser().parse_args([]).prng == "rbg"
        configure_prng(build_parser().parse_args([]))
        assert jax.config.jax_default_prng_impl == "rbg"
        k = jax.random.PRNGKey(0)
        assert jax.random.bits(k, (4,)).shape == (4,)
    finally:
        jax.config.update("jax_default_prng_impl", prev)


def test_guard_check_step_finite():
    """Failure detection (SURVEY §5.3): non-finite step metrics abort with a
    diagnostic naming the offending scalars; array metrics are ignored."""
    import numpy as np
    import pytest

    from xggm_tpu.utils.guard import TrainingDiverged, check_step_finite

    check_step_finite(0, "rel", {"clean_loss": 1.0,
                                 "preds": np.zeros(4, np.int32)})
    with pytest.raises(TrainingDiverged, match="clean_loss=nan"):
        check_step_finite(7, "rel", {"clean_loss": float("nan"),
                                     "ggm_loss": 2.0})
    with pytest.raises(TrainingDiverged, match="step 3.*branch='clean'"):
        check_step_finite(3, "clean", {"loss": float("inf")})


def test_trainer_aborts_on_nan_features(tmp_path):
    """End-to-end: corrupt input features -> the train loop raises
    TrainingDiverged instead of silently training on garbage."""
    import os

    import numpy as np
    import pytest

    from xggm_tpu.config import tiny_test_config, DataConfig, TrainConfig
    from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab
    from xggm_tpu.training.trainer import XGGMTrainer
    from xggm_tpu.utils.guard import TrainingDiverged

    root = str(tmp_path / "data")
    make_synthetic_gqa(root, "train", n_images=8, n_questions=16,
                       feat_dim=32)
    make_synthetic_gqa(root, "val", n_images=4, n_questions=8, feat_dim=32,
                       seed=1)
    write_vocab(os.path.join(root, "vocab.txt"))
    cfg = tiny_test_config(
        output=str(tmp_path / "out"),
        data=DataConfig(train="train", data_root=root),
        train=TrainConfig(batch_size=8, lr=1e-4, epochs=1, seed=1),
    )
    trainer = XGGMTrainer(cfg, task="gqa")

    real_get_batch = trainer.train_set.get_batch

    def poisoned(indices):
        b = real_get_batch(indices)
        b["feats"] = np.full_like(b["feats"], np.nan)
        return b

    trainer.train_set.get_batch = poisoned
    with pytest.raises(TrainingDiverged):
        trainer.train()


def test_cli_fp16_flag_maps_to_bf16():
    """--fp16 (reference apex switch) selects bf16 compute on TPU even when
    combined with an explicit --dtype float32."""
    import warnings

    from xggm_tpu.cli.common import build_parser, to_config

    args = build_parser().parse_args(
        ["--fp16", "--dtype", "float32", "--train", "train"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = to_config(args, "gqa")
    assert cfg.lxmert.dtype == "bfloat16"
    assert any("fp16" in str(x.message) for x in w)
    # plain float32 without --fp16 stays float32
    args = build_parser().parse_args(["--dtype", "float32"])
    assert to_config(args, "gqa").lxmert.dtype == "float32"
