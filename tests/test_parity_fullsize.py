"""Full-size (9/5/5 x 768) numeric parity vs the reference implementation.

The tiny goldens (tests/test_parity.py) pin per-op semantics; these tests
prove the SHIPPED scale: the full LXMERT stack reproduces reference logits
through the real torch->JAX bridge, and the QA answer-head surgery works at
a realistic pretraining-answer-table size. Reference weights are generated
in-process from /root/reference (random init, fixed seed) - no multi-hundred
-MB fixture is committed.

Reference anchors: src/lxrt/modeling.py:749-885 (LXRTModel),
src/pretrain/qa_answer_table.py:125-198 (load_lxmert_qa).
"""
import json
import os
import sys

import numpy as np
import pytest

REF = os.environ.get("XGGM_REFERENCE_PATH", "/root/reference")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

B, L, N = 4, 20, 36


@pytest.fixture(scope="module")
def fullsize_golden():
    """Random-init full-size reference LXRTModel -> (state dict, inputs,
    outputs) as numpy. Disk-cached (tests/ref_cache.py): deterministic
    derivation, re-run live whenever this file or the golden tooling
    changes."""
    from ref_cache import cached
    here = os.path.dirname(os.path.abspath(__file__))
    return cached(
        "fullsize_golden", dict(depth=(9, 5, 5), b=B, l=L, n=N),
        _build_fullsize_golden,
        depends_on=(os.path.abspath(__file__),
                    os.path.join(os.path.dirname(here), "tools",
                                 "make_goldens.py")))


def _build_fullsize_golden():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from make_goldens import flat_sd, setup_reference
    setup_reference()

    import torch
    import lxrt.modeling as M

    M.VISUAL_CONFIG.l_layers = 9
    M.VISUAL_CONFIG.x_layers = 5
    M.VISUAL_CONFIG.r_layers = 5
    M.VISUAL_CONFIG.set_visual_dims(2048, 4)
    cfg = M.BertConfig(vocab_size_or_config_json_file=30522, hidden_size=768,
                       num_hidden_layers=12, num_attention_heads=12,
                       intermediate_size=3072)
    torch.manual_seed(0)
    model = M.LXRTModel(cfg)
    model.apply(model.init_bert_weights)
    model.eval()

    rng = np.random.RandomState(7)
    ids = rng.randint(1, 30522, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[:, 13:] = 0
    seg = np.zeros((B, L), np.int64)
    feats = rng.randn(B, N, 2048).astype(np.float32)
    boxes = rng.rand(B, N, 4).astype(np.float32)

    with torch.no_grad():
        (lang, visn), pooled = model(
            torch.from_numpy(ids), torch.from_numpy(seg),
            torch.from_numpy(mask),
            visual_feats=(torch.from_numpy(feats), torch.from_numpy(boxes)))
    golden = {
        "input_ids": ids.astype(np.int32), "input_mask": mask.astype(np.int32),
        "segment_ids": seg.astype(np.int32), "feats": feats, "boxes": boxes,
        "out_lang": lang.numpy(), "out_visn": visn.numpy(),
        "out_pooled": pooled.numpy(),
    }
    return flat_sd(model), golden


@pytest.fixture(scope="module")
def fullsize_params(fullsize_golden):
    from xggm_tpu.checkpoint.torch_bridge import (
        convert_lxrt_bert, strip_prefixes, unflatten_params)
    from xggm_tpu.config import gqa_ood_config

    sd, _ = fullsize_golden
    lx_cfg = gqa_ood_config().lxmert
    flat, mapper = convert_lxrt_bert(strip_prefixes(sd), lx_cfg,
                                     torch_prefix="", our_prefix="lxrt")
    assert not mapper.missing, mapper.missing[:5]
    unused = set(sd.keys()) - mapper.used
    assert not unused, sorted(unused)[:5]
    flat = {k[len("lxrt/"):]: v for k, v in flat.items()}
    return lx_cfg, unflatten_params(flat)


def test_fullsize_forward_parity_fp32(fullsize_golden, fullsize_params):
    """Reference logits reproduced at the shipped 9/5/5 x 768 scale, fp32.

    Tolerance is wider than the tiny goldens' 2e-5: 19 layers of 768-dim
    accumulation amplify ulp-level divergence (erf-GeLU, rsqrt LN)."""
    from xggm_tpu.models.lxmert import LxmertModel

    _, g = fullsize_golden
    lx_cfg, params = fullsize_params
    model = LxmertModel(lx_cfg)
    (lang, visn), pooled = model.apply(
        params, g["input_ids"], g["input_mask"], g["segment_ids"],
        g["feats"], g["boxes"], deterministic=True)
    np.testing.assert_allclose(np.asarray(pooled), g["out_pooled"],
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(lang), g["out_lang"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(visn), g["out_visn"],
                               rtol=5e-4, atol=5e-4)


def test_fullsize_bf16_delta(fullsize_golden, fullsize_params):
    """Document the bf16-compute divergence at full size: the shipped
    training recipe computes in bfloat16 (fp32 params/LN). The pooled
    output must stay within bf16 resolution-scaled error of the fp32
    reference - a guardrail against silent precision regressions."""
    import dataclasses

    from xggm_tpu.models.lxmert import LxmertModel

    _, g = fullsize_golden
    lx_cfg, params = fullsize_params
    model = LxmertModel(dataclasses.replace(lx_cfg, dtype="bfloat16"))
    (_, _), pooled = model.apply(
        params, g["input_ids"], g["input_mask"], g["segment_ids"],
        g["feats"], g["boxes"], deterministic=True)
    ours = np.asarray(pooled, np.float32)
    ref = g["out_pooled"]
    err = np.abs(ours - ref)
    # element-wise relative error is meaningless on near-zero tanh outputs;
    # normalize by the output's scale instead
    scaled_max = float(err.max() / ref.std())
    corr = float(np.corrcoef(ours.ravel(), ref.ravel())[0, 1])
    # bf16 has ~8 mantissa bits; the 19-layer stack compounds to a few
    # percent of output scale. Guardrail at ~3x the measured value.
    assert scaled_max < 0.25, f"bf16 divergence: {scaled_max:.4f} of std"
    assert corr > 0.995, f"bf16 output decorrelated: {corr:.5f}"


def test_fullsize_qa_surgery(tmp_path, fullsize_golden):
    """Answer-head surgery at realistic scale: 9500-answer pretraining head
    mapped onto the 1842-answer GQA task head (matched rows copied under
    normalization, unmatched rows zeroed), with the full-size encoder loaded
    through the same .pth."""
    import torch

    from xggm_tpu.checkpoint.answer_table import load_lxmert_qa
    from xggm_tpu.config import gqa_ood_config
    from xggm_tpu.models.task_model import XGGMModel

    sd, g = fullsize_golden
    hid, n_pre, n_task = 768, 9500, 1842
    rng = np.random.RandomState(5)

    # pretraining vocab: 'answer_i'; every 3rd task answer matches directly,
    # plus normalization cases
    pre_answers = [f"answer_{i}" for i in range(n_pre - 3)] + [
        "2", "gray", "man"]
    out = {f"bert.{k}": torch.from_numpy(v.copy()) for k, v in sd.items()}
    out["answer_head.logit_fc.0.weight"] = torch.from_numpy(
        rng.randn(2 * hid, hid).astype(np.float32))
    out["answer_head.logit_fc.0.bias"] = torch.zeros(2 * hid)
    out["answer_head.logit_fc.2.weight"] = torch.ones(2 * hid)
    out["answer_head.logit_fc.2.bias"] = torch.zeros(2 * hid)
    out["answer_head.logit_fc.3.weight"] = torch.from_numpy(
        rng.randn(n_pre, 2 * hid).astype(np.float32))
    out["answer_head.logit_fc.3.bias"] = torch.from_numpy(
        rng.randn(n_pre).astype(np.float32))
    path = str(tmp_path / "full_LXRT.pth")
    torch.save(out, path)

    all_ans_path = str(tmp_path / "all_ans.json")
    with open(all_ans_path, "w") as f:
        json.dump([{"ans": a, "dsets": ["vqa"]} for a in pre_answers], f)

    # task vocab: half direct matches, normalization matches, half unmatched
    label2ans = []
    for i in range(n_task - 3):
        label2ans.append(f"answer_{i}" if i % 2 == 0 else f"unseen_{i}")
    label2ans += ["two", "grey", "a man"]  # normalize to 2/gray/man

    import jax
    cfg = gqa_ood_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    params = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            g["input_ids"], g["input_mask"], g["segment_ids"],
            g["feats"], g["boxes"],
            np.zeros((B, N, N), np.float32), jax.random.PRNGKey(2),
            method=XGGMModel.init_all))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)

    new_params = load_lxmert_qa(path, params, label2ans, cfg.lxmert,
                                all_ans_path)
    k = np.asarray(new_params["params"]["logit_fc"]["fc2"]["kernel"])
    b = np.asarray(new_params["params"]["logit_fc"]["fc2"]["bias"])
    pre_w = out["answer_head.logit_fc.3.weight"].numpy().T
    pre_b = out["answer_head.logit_fc.3.bias"].numpy()
    idx = {a: i for i, a in enumerate(pre_answers)}

    matched = zeroed = 0
    for j, ans in enumerate(label2ans):
        norm = {"two": "2", "grey": "gray", "a man": "man"}.get(ans, ans)
        if norm in idx:
            np.testing.assert_allclose(k[:, j], pre_w[:, idx[norm]],
                                       err_msg=f"row {j} ({ans})")
            np.testing.assert_allclose(b[j], pre_b[idx[norm]])
            matched += 1
        else:
            assert np.all(k[:, j] == 0.0) and b[j] == 0.0, f"row {j} ({ans})"
            zeroed += 1
    assert matched > 800 and zeroed > 800, (matched, zeroed)
    # encoder came along through the same file
    emb = np.asarray(
        new_params["params"]["lxrt"]["embeddings"]["word_embeddings"]
        ["embedding"])
    np.testing.assert_allclose(emb, sd["embeddings.word_embeddings.weight"])
