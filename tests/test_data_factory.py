"""Data factory tools: TSV->H5 conversion and adjacency precompute,
cross-checked against the reference's per-pair torch cosine algorithm."""
import base64

import numpy as np
import pytest


def write_synthetic_tsv(path, img_ids, feat_dim=64, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for img_id in img_ids:
        n = 36
        h, w = int(rng.randint(200, 600)), int(rng.randint(200, 600))
        fields = {
            "img_id": img_id, "img_h": h, "img_w": w, "num_boxes": n,
            "objects_id": rng.randint(0, 10, n).astype(np.int64),
            "objects_conf": rng.rand(n).astype(np.float32),
            "attrs_id": rng.randint(0, 5, n).astype(np.int64),
            "attrs_conf": rng.rand(n).astype(np.float32),
            "boxes": rng.rand(n, 4).astype(np.float32) * [[w, h, w, h]],
            "features": rng.randn(n, feat_dim).astype(np.float32),
        }
        row = [str(fields["img_id"]), str(h), str(w)]
        for key in ("objects_id", "objects_conf", "attrs_id", "attrs_conf"):
            row.append(base64.b64encode(fields[key].tobytes()).decode())
        row.insert(7, str(n))
        row.append(base64.b64encode(
            fields["boxes"].astype(np.float32).tobytes()).decode())
        row.append(base64.b64encode(fields["features"].tobytes()).decode())
        rows.append("\t".join(row))
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def test_tsv_roundtrip(tmp_path):
    from xggm_tpu.data.pretrain_data import load_obj_tsv
    from tools.tsv2h5 import tsv_to_h5
    import h5py

    tsv = str(tmp_path / "x.tsv")
    write_synthetic_tsv(tsv, ["a", "b", "c"])
    items = load_obj_tsv(tsv)
    assert len(items) == 3
    assert items[0]["features"].shape == (36, 64)
    assert items[0]["boxes"].shape == (36, 4)

    out = str(tmp_path / "x.h5")
    n = tsv_to_h5(tsv, {"a", "c"}, out, str(tmp_path / "x_info.json"))
    assert n == 2
    with h5py.File(out) as f:
        assert set(f.keys()) == {"a", "c"}
        np.testing.assert_array_equal(f["a"]["features"],
                                      items[0]["features"])


def test_adjacency_matches_reference_algorithm():
    """Vectorized vocab-cached adjacency == reference per-pair torch cosine
    (compute_cosin_sim_v2 + /max, compute_adjacency_train.py:37-44,88)."""
    import torch
    from tools.compute_adjacency import adjacency_from_ids

    rng = np.random.RandomState(0)
    obj_emb = rng.randn(10, 32).astype(np.float32)
    attr_emb = rng.randn(5, 32).astype(np.float32)
    obj_ids = rng.randint(0, 10, 36)
    attr_ids = rng.randint(0, 5, 36)

    ours = adjacency_from_ids(obj_ids, attr_ids, obj_emb, attr_emb)

    m1 = torch.from_numpy(obj_emb[obj_ids])
    m2 = torch.from_numpy(attr_emb[attr_ids])
    ref = torch.zeros((36, 36))
    for i in range(36):
        for j in range(36):
            if j >= i:
                ref[i, j] = torch.cosine_similarity(m1[i], m2[j], dim=0,
                                                    eps=1e-6)
    ref = ref + ref.T
    ref = ref / ref.max()
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_compute_adjacency_end_to_end(tmp_path):
    import h5py
    import jax

    from tools.tsv2h5 import tsv_to_h5
    from tools.compute_adjacency import (
        embed_vocab, compute_adjacency)
    from xggm_tpu.config import BertConfig
    from xggm_tpu.data.tokenizer import BertTokenizer, make_test_vocab
    from xggm_tpu.models.lxmert import BertTextModel

    tsv = str(tmp_path / "x.tsv")
    write_synthetic_tsv(tsv, ["a", "b"])
    obj_h5 = str(tmp_path / "x.h5")
    tsv_to_h5(tsv, {"a", "b"}, obj_h5, str(tmp_path / "i.json"))

    tok = BertTokenizer(make_test_vocab())
    cfg = BertConfig(vocab_size=len(tok.vocab), hidden_size=32,
                     num_attention_heads=2, intermediate_size=64)
    model = BertTextModel(cfg, num_layers=1)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        np.zeros((2, 16), np.int32))
    obj_names = [f"dog {i}" for i in range(10)]
    attr_names = [f"red {i}" for i in range(5)]
    obj_emb = embed_vocab(obj_names, tok, params, model, batch_size=4)
    attr_emb = embed_vocab(attr_names, tok, params, model, batch_size=4)
    assert obj_emb.shape == (10, 32)

    out = str(tmp_path / "adj.h5")
    n = compute_adjacency(obj_h5, out, obj_emb, attr_emb)
    assert n == 2
    with h5py.File(out) as f:
        a = np.asarray(f["a"])
        assert a.shape == (36, 36)
        np.testing.assert_allclose(a, a.T, rtol=1e-5)
        assert a.max() == pytest.approx(1.0)
