"""Pretraining path: synthetic corpus -> featurizer invariants -> model
losses (golden parity vs the reference LXRTPretraining) -> optimizer
trajectory parity -> one pretrainer epoch."""
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

from xggm_tpu.config import tiny_test_config, TrainConfig
from xggm_tpu.data.pretrain_data import (
    LxmertPretrainDataset, PretrainFeaturizer, LxmertPretrainEvaluator,
)
from xggm_tpu.data.synthetic_pretrain import make_synthetic_pretrain
from xggm_tpu.data.tokenizer import BertTokenizer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ptdata"))
    make_synthetic_pretrain(root, n_images=8, sents_per_img=2, feat_dim=32)
    ds = LxmertPretrainDataset("mscoco_train", root)
    ds.load_features_h5(
        os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36.h5"),
        os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36_info.json"))
    tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
    feat = PretrainFeaturizer(ds, tok, max_seq_length=20,
                              task_matched=True, seed=0)
    return root, ds, tok, feat


def test_flatten_and_featurize(corpus):
    root, ds, tok, feat = corpus
    # 8 images x (2 mscoco + 2 vqa) sentences
    assert len(feat) == 32
    batch, uids = feat.featurize(list(range(8)))
    assert batch["input_ids"].shape == (8, 20)
    assert batch["lm_labels"].shape == (8, 20)
    assert batch["feats"].shape == (8, 36, 32)
    assert batch["ans"].min() >= -1
    # masked positions carry original ids; others are -1
    lm = batch["lm_labels"]
    assert (lm == -1).sum() > 0
    # mismatched pairs get ans == -1
    unmatched = batch["matched_labels"] == 0
    assert np.all(batch["ans"][unmatched] == -1)
    # feat_mask marks masked objects; zeroed features where mask and 80% arm
    assert batch["feat_mask"].max() <= 1.0


def test_pretrain_model_losses(corpus):
    import jax
    from xggm_tpu.models.pretrain_model import PretrainModel

    root, ds, tok, feat = corpus
    cfg = tiny_test_config()
    model = PretrainModel(cfg.lxmert, num_answers=ds.num_answers)
    batch, _ = feat.featurize(list(range(4)))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"])
    total, losses, ans_logits = model.apply(
        params, batch, deterministic=True,
        method=PretrainModel.compute_losses)
    assert set(losses) == {"Mask_LM", "Matched", "Obj", "Attr", "Feat", "QA"}
    assert np.isfinite(float(total))
    np.testing.assert_allclose(
        float(total), sum(float(v) for v in losses.values()), rtol=1e-5)
    assert ans_logits.shape == (4, ds.num_answers)


def _tiny_pretrain_cfg():
    from xggm_tpu.config import LxmertConfig, BertConfig, VisualConfig

    return LxmertConfig(
        bert=BertConfig(vocab_size=128, hidden_size=64,
                        num_attention_heads=4, intermediate_size=128,
                        max_position_embeddings=64),
        visual=VisualConfig(l_layers=2, x_layers=1, r_layers=1,
                            visual_feat_dim=32, visual_pos_dim=4))


def _golden_batch(z, prefix):
    g = lambda k: z[prefix + k]  # noqa: E731
    conf = g("conf")
    return {
        "input_ids": g("input_ids").astype(np.int32),
        "input_mask": g("input_mask").astype(np.int32),
        "segment_ids": g("segment_ids").astype(np.int32),
        "feats": g("feats"), "boxes": g("boxes"),
        "lm_labels": g("lm_labels").astype(np.int32),
        "matched_labels": g("matched").astype(np.int32),
        "obj_labels": g("obj_labels").astype(np.int32), "obj_mask": conf,
        "attr_labels": g("attr_labels").astype(np.int32), "attr_mask": conf,
        "feat_labels": g("feat_target"), "feat_mask": conf,
        "ans": g("ans").astype(np.int32),
    }


def _bridged_pretrain_model(z, num_answers=16):
    import jax
    from xggm_tpu.checkpoint.torch_bridge import (
        convert_pretrain_model, merge_into)
    from xggm_tpu.models.pretrain_model import PretrainModel

    cfg = _tiny_pretrain_cfg()
    model = PretrainModel(cfg, num_answers=num_answers)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    B, L = 2, 20
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.ones((B, L), np.int32), np.ones((B, L), np.int32),
        np.zeros((B, L), np.int32),
        np.zeros((B, 36, 32), np.float32), np.zeros((B, 36, 4), np.float32))
    flat = convert_pretrain_model(sd, cfg)
    params, unmatched = merge_into(params, flat)
    assert not unmatched, unmatched[:8]
    return model, params


def test_pretrain_loss_parity_vs_reference():
    """The 4-loss pretraining math (masked-LM CE ignore -1, matched CE,
    obj/attr CE + SmoothL1 feat loss masked by confidence and weighted
    1/0.15, QA CE - reference modeling.py:1007-1061) pinned per-loss against
    a trace of the reference LXRTPretraining through the torch bridge
    (fixture: tools/make_goldens.make_pretrain_golden)."""
    from xggm_tpu.models.pretrain_model import PretrainModel

    z = np.load(os.path.join(GOLDENS, "pretrain_tiny.npz"))
    model, params = _bridged_pretrain_model(z)
    batch = _golden_batch(z, "in::")
    total, losses, ans_logits = model.apply(
        params, batch, deterministic=True,
        method=PretrainModel.compute_losses)
    ours = [float(losses[k]) for k in
            ("Mask_LM", "Matched", "Obj", "Attr", "Feat", "QA")]
    np.testing.assert_allclose(ours, z["losses"], rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(float(total), float(z["total"]), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(ans_logits), z["ans_logit"],
                               rtol=1e-3, atol=2e-4)


def test_pretrain_trajectory_parity_vs_reference():
    """4 steps of the reference pretraining loop (BertAdam lr 1e-3, warmup
    0.05, t_total 8, clip 1.0, ONE optimizer step per batch -
    lxmert_pretrain.py:308-341) replayed through our jitted step: per-step
    total + 6-loss sequence and final pooler weights must match.

    Known approximation (documented in training/bert_adam.py): leaves whose
    gradient is an all-zero TENSOR in torch (the padding_idx-zeroed token
    type table) tick weight decay in the reference but stay inactive here -
    at these lrs the divergence is ~1e-7/step, far under tolerance."""
    import jax
    from xggm_tpu.models.pretrain_model import PretrainModel
    from xggm_tpu.training.bert_adam import bert_adam
    from xggm_tpu.training.steps import TrainState, _clip_update_apply

    z = np.load(os.path.join(GOLDENS, "pretrain_traj_tiny.npz"))
    model, params = _bridged_pretrain_model(z)
    batches = [_golden_batch(z, "b0::"), _golden_batch(z, "b1::")]

    tx = bert_adam(lr=1e-3, warmup=0.05, t_total=8)
    state = TrainState(params, tx.init(params))

    def loss_fn(params, batch):
        total, losses, _ = model.apply(params, batch, deterministic=True,
                                       method=PretrainModel.compute_losses)
        return total, losses

    @jax.jit
    def step(state, batch):
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        state = _clip_update_apply(tx, grads, state, clip=1.0)
        return state, total, losses

    seq = []
    for i in range(4):
        state, total, losses = step(state, batches[i % 2])
        seq.append([float(total)] + [float(losses[k]) for k in
                                     ("Mask_LM", "Matched", "Obj", "Attr",
                                      "Feat", "QA")])
    np.testing.assert_allclose(np.asarray(seq, np.float32), z["loss_seq"],
                               rtol=1e-3, atol=1e-4)
    ours_pooler = np.asarray(
        state.params["params"]["lxrt"]["pooler"]["dense"]["kernel"])
    np.testing.assert_allclose(ours_pooler, z["final_pooler_kernel"],
                               rtol=1e-3, atol=2e-5)


def test_pretrainer_epoch(corpus, tmp_path):
    from xggm_tpu.training.pretrainer import LxmertPretrainer

    root, ds, tok, feat = corpus
    cfg = tiny_test_config(
        output=str(tmp_path / "out"),
        train=TrainConfig(batch_size=8, lr=1e-4, epochs=1, seed=0))
    trainer = LxmertPretrainer(cfg, feat, valid_feat=feat)
    best = trainer.train()
    assert np.isfinite(best)
    assert trainer.ckpt.exists("Epoch01")
    assert trainer.ckpt.exists("BEST_EVAL_LOSS")
    assert int(np.asarray(trainer.state.opt_state.count)) == 4


def test_pretrainer_on_mesh(corpus, tmp_path):
    """Mesh pretraining (reference DataParallels the whole model here,
    lxmert_pretrain.py:255-256): batch sharded on 'data', loss identical to
    the single-device run (same seed, same data)."""
    import jax

    from xggm_tpu.parallel.mesh import make_mesh
    from xggm_tpu.training.pretrainer import LxmertPretrainer

    root, ds, tok, feat = corpus
    assert len(jax.devices()) == 8

    def make(mesh, out):
        cfg = tiny_test_config(
            output=str(tmp_path / out),
            train=TrainConfig(batch_size=8, lr=1e-4, epochs=1, seed=0))
        return LxmertPretrainer(cfg, feat, valid_feat=feat, mesh=mesh)

    tr_mesh = make(make_mesh(), "mesh_out")
    tr_single = make(None, "single_out")

    # single-step loss parity: SPMD must not change the math (epoch-level
    # losses drift at ~1e-3 from all-reduce summation-order differences)
    batch, _ = feat.featurize(list(range(8)))
    key = jax.random.PRNGKey(7)
    _, loss_m, _, _ = tr_mesh.train_step(
        tr_mesh.state, tr_mesh._put(batch), key)
    _, loss_s, _, _ = tr_single.train_step(
        tr_single.state, tr_single._put(batch), key)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=2e-4)

    # full epoch runs on the mesh (fresh state: steps donate their input)
    tr_mesh = make(make_mesh(), "mesh_out2")
    best = tr_mesh.train()
    assert np.isfinite(best)
    assert int(np.asarray(tr_mesh.state.opt_state.count)) == 4


def test_pretrainer_bf16_shadow(corpus, tmp_path):
    """With bf16 compute the pretrainer carries the bf16 param shadow
    (steps.bf16_param_shadow, refreshed by every train_step): fwd/bwd read
    half the weight bytes; the loss matches the no-shadow run at bf16
    rounding level, and the refreshed shadow is exactly a cast of the
    updated masters."""
    import jax

    from xggm_tpu.training.pretrainer import LxmertPretrainer
    from xggm_tpu.training.steps import bf16_param_shadow

    root, ds, tok, feat = corpus

    def make(bf16_params, out):
        cfg = tiny_test_config(
            output=str(tmp_path / out),
            train=TrainConfig(batch_size=8, lr=1e-4, epochs=1, seed=0,
                              bf16_params=bf16_params))
        cfg = cfg.replace(lxmert=cfg.lxmert.replace(dtype="bfloat16"))
        return LxmertPretrainer(cfg, feat, valid_feat=feat)

    tr = make(True, "shadow_out")
    assert tr.state.params_bf16, "bf16 compute must carry the shadow"
    tr_plain = make(False, "plain_out")
    assert tr_plain.state.params_bf16 is None

    batch, _ = feat.featurize(list(range(8)))
    key = jax.random.PRNGKey(3)
    st, loss, _, _ = tr.train_step(tr.state, batch, key)
    _, loss_p, _, _ = tr_plain.train_step(tr_plain.state, batch, key)
    np.testing.assert_allclose(float(loss), float(loss_p),
                               rtol=2e-2, atol=1e-3)
    # refreshed shadow is exactly a cast of the updated masters
    refreshed = bf16_param_shadow(st.params)
    assert set(st.params_bf16) == set(refreshed)
    for k in refreshed:
        np.testing.assert_array_equal(np.asarray(st.params_bf16[k]),
                                      np.asarray(refreshed[k]))


def test_pretrain_evaluator(corpus):
    root, ds, tok, feat = corpus
    ev = LxmertPretrainEvaluator(ds)
    # answering every labeled uid with its gold answer scores 1.0
    uid2ans = {}
    for ex in feat.examples:
        if ex.label:
            aid = max(ex.label, key=ex.label.get)
            uid2ans[ex.uid] = ds.answer_table.id2ans(aid)
    acc, per_dset = ev.evaluate(uid2ans)
    assert acc == pytest.approx(1.0)
    assert per_dset.get("vqa") == pytest.approx(1.0)


def test_pretrain_zero_sharded_optimizer(corpus, tmp_path):
    """cfg.train.shard_opt_state through the PRETRAINER: moments land
    'data'-sharded, the step runs (donation + constraint), and a full epoch
    trains to completion with checkpoint saves from the sharded state."""
    import dataclasses

    import jax

    from xggm_tpu.parallel.mesh import make_mesh
    from xggm_tpu.training.pretrainer import LxmertPretrainer

    root, ds, tok, feat = corpus
    base = TrainConfig(batch_size=8, lr=1e-4, epochs=1, seed=0)
    cfg = tiny_test_config(
        output=str(tmp_path / "zero_out"),
        train=dataclasses.replace(base, shard_opt_state=True))
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(dtype="bfloat16"))
    tr = LxmertPretrainer(cfg, feat, valid_feat=feat, mesh=make_mesh())

    from xggm_tpu.parallel.mesh import axis_sharded_leaves
    sharded = axis_sharded_leaves(tr.state.opt_state.m, "data")
    assert len(sharded) > 20
    assert (sharded[0].addressable_shards[0].data.size
            == sharded[0].size // tr.mesh.shape["data"])

    batch, _ = feat.featurize(list(range(8)))
    state, total, losses, _ = tr.train_step(
        tr.state, tr._put(batch), jax.random.PRNGKey(3))
    assert np.isfinite(float(total))
    # the with_sharding_constraint keeps the ZeRO layout across steps
    assert len(axis_sharded_leaves(state.opt_state.m, "data")) == len(sharded)
    tr.state = state

    best = tr.train()
    assert np.isfinite(best)
    assert any(f.startswith("Epoch") or f.startswith("BEST")
               for f in os.listdir(cfg.output))
