"""End-to-end smoke: init tiny model, run both GGM train steps + eval step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xggm_tpu.config import tiny_test_config
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.training.bert_adam import bert_adam
from xggm_tpu.training.steps import (
    TrainState, make_ggm_train_step, make_eval_step, make_clean_train_step,
)


def make_batch(cfg, bs=4, seed=0):
    r = np.random.RandomState(seed)
    L = 20
    v = cfg.lxmert.visual
    ids = r.randint(1, cfg.lxmert.bert.vocab_size, size=(bs, L)).astype(np.int32)
    mask = np.ones((bs, L), np.int32)
    mask[:, 10:] = 0
    adj = r.rand(bs, 36, 36).astype(np.float32)
    adj = (adj + adj.transpose(0, 2, 1)) / 2
    return {
        "input_ids": ids,
        "input_mask": mask,
        "segment_ids": np.zeros((bs, L), np.int32),
        "feats": r.randn(bs, 36, v.visual_feat_dim).astype(np.float32),
        "boxes": r.rand(bs, 36, 4).astype(np.float32),
        "target": (r.rand(bs, 16) > 0.9).astype(np.float32),
        "adj": adj,
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    batch = make_batch(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    return cfg, model, params, batch


def test_forward_shapes(setup):
    cfg, model, params, batch = setup
    (lang, visn), mask, pooled = model.apply(
        params, batch["input_ids"], batch["input_mask"],
        batch["segment_ids"], batch["feats"], batch["boxes"])
    hid = cfg.lxmert.bert.hidden_size
    assert lang.shape == (4, 20, hid)
    assert visn.shape == (4, 36, hid)
    assert pooled.shape == (4, hid)
    assert np.all(np.isfinite(np.asarray(pooled)))


@pytest.mark.parametrize("branch", ["relation", "representation"])
def test_ggm_train_step(setup, branch):
    cfg, model, params, batch = setup
    tx = bert_adam(lr=1e-4, warmup=0.1, t_total=100)
    # the step donates its input buffers - give it a private copy
    params_c = jax.tree.map(lambda x: x.copy(), params)
    state = TrainState(params_c, tx.init(params_c))
    step = make_ggm_train_step(model, tx, cfg.train, branch)
    # snapshot before stepping: the step donates its input state buffers
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    for k in ("ggm_loss", "clean_loss", "d_loss", "loss_grad", "loss_sm"):
        val = float(metrics[k])
        assert np.isfinite(val), f"{k} not finite"
    assert metrics["preds"].shape == (4,)
    # two optimizer steps happened
    assert int(state2.opt_state.count) == 2
    # params changed (step 1 has lr=0 by the reference's pre-increment
    # schedule quirk, but step 2 doesn't)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - b))),
                        state2.params, before)
    assert max(jax.tree.leaves(diff)) > 0


def test_clean_step_and_eval(setup):
    cfg, model, params, batch = setup
    tx = bert_adam(lr=1e-4, warmup=0.1, t_total=100)
    params_c = jax.tree.map(lambda x: x.copy(), params)
    state = TrainState(params_c, tx.init(params_c))
    step = make_clean_train_step(model, tx, cfg.train, cfg.num_answers)
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["clean_loss"]))

    eval_step = make_eval_step(model)
    preds = eval_step(state2.params, batch)
    assert preds.shape == (4,)
    assert preds.dtype in (jnp.int32, jnp.int64)
