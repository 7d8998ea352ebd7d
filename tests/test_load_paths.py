"""The three reference weight-load paths (SURVEY §5.4) against synthetic
torch snapshots: --loadLXMERT (encoder only), --loadLXMERTQA (encoder +
answer-head surgery), --load (task checkpoint)."""
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model_and_params():
    import jax

    from xggm_tpu.config import tiny_test_config
    from xggm_tpu.models.task_model import XGGMModel

    cfg = tiny_test_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    B = 2
    batch = {
        "input_ids": rng.randint(1, 128, (B, 20)).astype(np.int32),
        "input_mask": np.ones((B, 20), np.int32),
        "segment_ids": np.zeros((B, 20), np.int32),
        "feats": rng.randn(B, 36, 32).astype(np.float32),
        "boxes": rng.rand(B, 36, 4).astype(np.float32),
        "adj": rng.rand(B, 36, 36).astype(np.float32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    return cfg, model, params, batch


def _torch_pretrain_snapshot(tmp_path, num_pre_answers=12, hid=64):
    """bert.* + answer_head.logit_fc.* keys, as LXRTPretraining saves."""
    import torch

    from tests.test_parity import load_golden

    sd, _ = load_golden("lxrt_tiny.npz")
    out = {f"bert.{k}": torch.from_numpy(v.copy()) for k, v in sd.items()}
    rng = np.random.RandomState(5)
    out["answer_head.logit_fc.0.weight"] = torch.from_numpy(
        rng.randn(2 * hid, hid).astype(np.float32))
    out["answer_head.logit_fc.0.bias"] = torch.zeros(2 * hid)
    out["answer_head.logit_fc.2.weight"] = torch.ones(2 * hid)
    out["answer_head.logit_fc.2.bias"] = torch.zeros(2 * hid)
    out["answer_head.logit_fc.3.weight"] = torch.from_numpy(
        rng.randn(num_pre_answers, 2 * hid).astype(np.float32))
    out["answer_head.logit_fc.3.bias"] = torch.from_numpy(
        rng.randn(num_pre_answers).astype(np.float32))
    path = str(tmp_path / "pretrained_LXRT.pth")
    torch.save(out, path)
    return path, out


def test_load_lxmert_qa_surgery(tmp_path, tiny_model_and_params):
    from xggm_tpu.checkpoint.answer_table import load_lxmert_qa

    cfg, model, params, batch = tiny_model_and_params
    path, torch_sd = _torch_pretrain_snapshot(tmp_path)

    # pretraining answer vocab: first 12 of the task's 16 answers, with
    # normalization cases ('two' -> '2' means 'two' matches table entry '2')
    pre_answers = ["yes", "no", "2", "dog", "cat", "red", "blue", "man",
                   "woman", "gray", "left", "right"]
    all_ans = [{"ans": a, "dsets": ["vqa"]} for a in pre_answers]
    all_ans_path = str(tmp_path / "all_ans.json")
    with open(all_ans_path, "w") as f:
        json.dump(all_ans, f)

    # task label2ans: includes convertible ('two'->'2', 'grey'->'gray',
    # 'a man'->'man') and unmatched answers
    label2ans = ["yes", "no", "two", "grey", "a man", "zebra", "dog", "cat",
                 "red", "blue", "left", "right", "up", "down", "big", "small"]
    new_params = load_lxmert_qa(path, params, label2ans, cfg.lxmert,
                                all_ans_path)

    k = np.asarray(new_params["params"]["logit_fc"]["fc2"]["kernel"])
    b = np.asarray(new_params["params"]["logit_fc"]["fc2"]["bias"])
    pre_w = torch_sd["answer_head.logit_fc.3.weight"].numpy().T
    pre_b = torch_sd["answer_head.logit_fc.3.bias"].numpy()

    idx = {a: i for i, a in enumerate(pre_answers)}
    # direct + normalized matches pull the pretrained row
    np.testing.assert_allclose(k[:, 0], pre_w[:, idx["yes"]])
    np.testing.assert_allclose(k[:, 2], pre_w[:, idx["2"]])     # two -> 2
    np.testing.assert_allclose(k[:, 3], pre_w[:, idx["gray"]])  # grey -> gray
    np.testing.assert_allclose(k[:, 4], pre_w[:, idx["man"]])   # a man -> man
    np.testing.assert_allclose(b[0], pre_b[idx["yes"]])
    # unmatched answers are ZEROED (reference qa_answer_table.py:178-181)
    assert np.all(k[:, 5] == 0.0) and b[5] == 0.0   # zebra
    assert np.all(k[:, 12] == 0.0)                  # up

    # encoder weights loaded too: forward now matches the golden encoder
    from tests.test_parity import load_golden
    from xggm_tpu.models.task_model import XGGMModel
    _, g = load_golden("lxrt_tiny.npz")
    (lang, visn), mask, pooled = model.apply(
        new_params, g["input_ids"], g["input_mask"], g["segment_ids"],
        g["feats"], g["boxes"], deterministic=True)
    np.testing.assert_allclose(np.asarray(pooled), g["out_pooled"],
                               rtol=2e-5, atol=2e-5)


def test_load_lxmert_encoder_only(tmp_path, tiny_model_and_params):
    import torch

    from tests.test_parity import load_golden
    from xggm_tpu.checkpoint.torch_bridge import (
        load_torch_state_dict, strip_prefixes, convert_lxrt_bert, merge_into)

    cfg, model, params, batch = tiny_model_and_params
    sd, g = load_golden("lxrt_tiny.npz")
    path = str(tmp_path / "enc_LXRT.pth")
    torch.save({f"module.bert.{k}": torch.from_numpy(v.copy())
                for k, v in sd.items()}, path)  # with DataParallel prefix

    loaded = strip_prefixes(load_torch_state_dict(path))
    flat, mapper = convert_lxrt_bert(loaded, cfg.lxmert,
                                     torch_prefix="bert.", our_prefix="lxrt")
    assert not mapper.missing
    new_params, unmatched = merge_into(params, flat)
    # only non-encoder leaves untouched
    assert all(not u.startswith("lxrt/") for u in unmatched)
    (l, v), m, pooled = model.apply(
        new_params, g["input_ids"], g["input_mask"], g["segment_ids"],
        g["feats"], g["boxes"], deterministic=True)
    np.testing.assert_allclose(np.asarray(pooled), g["out_pooled"],
                               rtol=2e-5, atol=2e-5)
