"""TPU-side scaling knobs (no reference counterpart):

* `lxmert.remat` — per-layer activation rematerialization (jax.checkpoint
  over every encoder layer): identical params/numerics, O(1) activation
  memory across the stacks.
* `train.accum_steps` — pretraining gradient accumulation: one BertAdam
  update per N microbatches, numerically the mean-of-microbatch-grads
  update.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xggm_tpu.config import tiny_test_config, TrainConfig
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.ops.losses import bce_with_logits

from tests.test_smoke import make_batch


def _flat(params):
    from xggm_tpu.training.steps import _path_str
    return {_path_str(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(params)}


def _init(cfg, batch):
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    return model, params


@pytest.mark.parametrize("stacked", [False, True])
def test_remat_param_tree_identical(stacked):
    """nn.remat is a lifted transform: the param tree (paths, shapes,
    values from the same init keys) must be byte-identical with and
    without it — the torch bridge and checkpoints are remat-agnostic."""
    cfg = tiny_test_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(stacked_layers=stacked))
    batch = make_batch(cfg)
    _, p_plain = _init(cfg, batch)
    _, p_remat = _init(
        cfg.replace(lxmert=cfg.lxmert.replace(remat=True)), batch)
    f0, f1 = _flat(p_plain), _flat(p_remat)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_array_equal(f0[k], f1[k])


@pytest.mark.parametrize("stacked", [False, True])
def test_remat_grads_match(stacked):
    """Rematerialization must not change the math: loss and grads of the
    clean forward agree with the plain graph (same fp32 computation,
    recomputed instead of stored)."""
    cfg = tiny_test_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(stacked_layers=stacked))
    batch = make_batch(cfg)
    model, params = _init(cfg, batch)
    cfg_r = cfg.replace(lxmert=cfg.lxmert.replace(remat=True))
    model_r = XGGMModel(cfg_r.lxmert, cfg_r.ggm, cfg_r.num_answers)

    def loss(m, p):
        logits = m.apply(p, batch["input_ids"], batch["input_mask"],
                         batch["segment_ids"], batch["feats"],
                         batch["boxes"], deterministic=True,
                         method=XGGMModel.clean_forward)
        return bce_with_logits(logits, batch["target"])

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(model_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    f0, f1 = _flat(g0), _flat(g1)
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_remat_two_phase_step_runs():
    """The full two-phase train step (dropout on, GGM branch) compiles and
    yields finite metrics under remat."""
    from xggm_tpu.training.bert_adam import bert_adam
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step

    cfg = tiny_test_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(remat=True))
    batch = make_batch(cfg)
    model, params = _init(cfg, batch)
    tx = bert_adam(lr=1e-4, warmup=0.1, t_total=10)
    step = make_ggm_train_step(model, tx, cfg.train, "relation")
    state = TrainState(params, tx.init(params))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert all(np.all(np.isfinite(np.asarray(v))) for v in metrics.values())


@pytest.fixture(scope="module")
def pt_corpus(tmp_path_factory):
    from xggm_tpu.data.pretrain_data import (
        LxmertPretrainDataset, PretrainFeaturizer)
    from xggm_tpu.data.synthetic_pretrain import make_synthetic_pretrain
    from xggm_tpu.data.tokenizer import BertTokenizer

    root = str(tmp_path_factory.mktemp("accumdata"))
    make_synthetic_pretrain(root, n_images=8, sents_per_img=2, feat_dim=32)
    ds = LxmertPretrainDataset("mscoco_train", root)
    ds.load_features_h5(
        os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36.h5"),
        os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36_info.json"))
    tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
    return PretrainFeaturizer(ds, tok, max_seq_length=20,
                              task_matched=True, seed=0)


def test_accum_equals_mean_grad_update(pt_corpus, tmp_path):
    """One accumulation group (k=2) == clip+BertAdam on the mean of the two
    microbatch gradients."""
    from xggm_tpu.models.pretrain_model import PretrainModel
    from xggm_tpu.training.pretrainer import LxmertPretrainer
    from xggm_tpu.training.steps import TrainState, _clip_update_apply

    cfg = tiny_test_config(
        output=str(tmp_path / "accum"),
        train=TrainConfig(batch_size=4, lr=1e-4, epochs=1, seed=0,
                          accum_steps=2))
    tr = LxmertPretrainer(cfg, pt_corpus, valid_feat=None)
    b1, _ = pt_corpus.featurize(list(range(4)))
    b2, _ = pt_corpus.featurize(list(range(4, 8)))
    k1, k2 = jax.random.PRNGKey(11), jax.random.PRNGKey(12)

    # manual reference: mean of the two microbatch grads -> one update
    def loss(p, b, k):
        total, _, _ = tr.model.apply(
            p, b, deterministic=False, rngs={"dropout": k},
            method=PretrainModel.compute_losses)
        return total

    own = lambda t: jax.tree.map(lambda x: jnp.array(np.asarray(x)), t)
    params0, opt0 = own(tr.state.params), own(tr.state.opt_state)
    g1 = jax.grad(loss)(params0, b1, k1)
    g2 = jax.grad(loss)(params0, b2, k2)
    mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    want = _clip_update_apply(tr.tx, mean, TrainState(params0, opt0), 1.0)

    # trainer path: two grad_steps into the accumulator, one apply_step
    acc = tr.zero_acc(tr.state.params)
    acc, loss1, _, preds = tr.grad_step(acc, tr.state.params, b1, k1)
    assert preds.shape == (4,)
    acc, loss2, _, _ = tr.grad_step(acc, tr.state.params, b2, k2)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    got = tr.apply_step(tr.state, acc)

    fw, fg = _flat(want.params), _flat(got.params)
    for k in fw:
        np.testing.assert_allclose(fg[k], fw[k], rtol=1e-6, atol=1e-8,
                                   err_msg=k)
    assert int(np.asarray(got.opt_state.count)) == 1


def test_accum_epoch_counts(pt_corpus, tmp_path):
    """Epoch accounting under accumulation: 32 examples / bs 4 = 8
    microbatches; k=3 drops the trailing partial group (2 optimizer steps),
    and t_total counts optimizer steps."""
    from xggm_tpu.training.pretrainer import LxmertPretrainer

    cfg = tiny_test_config(
        output=str(tmp_path / "accum_epoch"),
        train=TrainConfig(batch_size=4, lr=1e-4, epochs=1, seed=0,
                          accum_steps=3))
    tr = LxmertPretrainer(cfg, pt_corpus, valid_feat=pt_corpus)
    best = tr.train()
    assert np.isfinite(best)
    assert int(np.asarray(tr.state.opt_state.count)) == 2
