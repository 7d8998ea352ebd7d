"""bf16 param-shadow equivalence (training/steps.bf16_param_shadow).

With bfloat16 compute the model casts every Dense kernel/bias to bf16 at
use; carrying that cast across steps (TrainState.params_bf16) feeds every op
the same bf16 operand values while the fwd/bwd GEMMs read half the weight
bytes. These tests pin the claims the optimization rests on:

1. selection: exactly the bf16-consumed leaves are shadowed - LayerNorm
   scale/bias and embedding tables (consumed in fp32, ops/basic.py
   LayerNormBase / models/lxmert.BertEmbeddings) are read from the fp32
   masters;
2. equivalence: the fp32-master trajectory with and without the shadow
   agrees at bf16 rounding level over multiple steps, both GGM branches +
   the clean step. (Not bit-exact: XLA's excess-precision folding - on by
   default - may elide the fp32->bf16 convert in the master graph and carry
   extra precision through some fused ops. The shadow path is the honest
   all-bf16-operand computation; observed divergence is ~2e-3 relative on
   updates, i.e. bf16 epsilon.)
3. consistency: the refreshed shadow always equals a fresh cast of the
   final masters (exact - it IS that cast).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xggm_tpu.config import tiny_test_config
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
from xggm_tpu.training.steps import (
    TrainState, bf16_param_shadow, make_ggm_train_step,
    make_clean_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(dtype="bfloat16"))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    from __graft_entry__ import _make_batch
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, 4, cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    tx = bert_adam(lr=1e-3, warmup=0.1, t_total=64, lr_scale=scales)
    return cfg, model, tx, params, batch


def test_shadow_selection(setup):
    _, _, _, params, _ = setup
    shadow = bf16_param_shadow(params)
    assert shadow and all(v.dtype == jnp.bfloat16 for v in shadow.values())
    assert any(k.endswith("/kernel") for k in shadow), "no kernels shadowed"
    # fp32-consumed leaves are NOT shadowed (read from the masters): no
    # LayerNorm scale/bias, no embedding tables
    assert not any("LayerNorm" in k or "layer_norm" in k
                   or k.endswith("/scale") or k.endswith("/embedding")
                   for k in shadow)
    # ... and the model does HAVE such leaves, so the exclusion is real
    full = {"/".join(str(getattr(kk, "key", kk)) for kk in path)
            for path, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("LayerNorm" in k for k in full)
    assert any(k.endswith("/embedding") for k in full)
    assert len(shadow) < len(full)


def _assert_params_close(a_tree, b_tree):
    """Masters agree at bf16 rounding level: updates differ only through
    XLA excess-precision choices (bf16 epsilon ~8e-3 relative on operands),
    and the per-step difference compounds over the multi-step run - so this
    is an envelope, not bit-parity. Individual near-zero update elements can
    drift by tens of percent relatively, so the bound is a per-leaf relative
    L2 norm, not elementwise rtol."""
    for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        diff = np.linalg.norm(a - b)
        ref = np.linalg.norm(a)
        assert diff <= 3e-2 * ref + 2e-5, (diff, ref, a.shape)


def _run(steps_fn, state, batch, n=3):
    for i in range(n):
        state, metrics = steps_fn[i % len(steps_fn)](
            state, batch, jax.random.PRNGKey(100 + i))
    return state, metrics


@pytest.mark.parametrize("first_branch", ["relation", "representation"])
def test_equivalent_trajectory(setup, first_branch):
    cfg, model, tx, params, batch = setup
    rel = make_ggm_train_step(model, tx, cfg.train, "relation")
    rep = make_ggm_train_step(model, tx, cfg.train, "representation")
    steps = [rel, rep] if first_branch == "relation" else [rep, rel]

    fresh = lambda: jax.tree.map(jnp.array, params)  # noqa: E731 (donation)
    p0 = fresh()
    plain, m_plain = _run(steps, TrainState(p0, tx.init(p0)), batch)
    p1 = fresh()
    shadowed, m_shadow = _run(
        steps, TrainState(p1, tx.init(p1), bf16_param_shadow(p1)), batch)

    _assert_params_close(plain.params, shadowed.params)
    for k in m_plain:
        if np.asarray(m_plain[k]).dtype.kind == "f":
            np.testing.assert_allclose(np.asarray(m_plain[k], np.float32),
                                       np.asarray(m_shadow[k], np.float32),
                                       rtol=2e-2, atol=1e-3)
        else:  # preds
            np.testing.assert_array_equal(np.asarray(m_plain[k]),
                                          np.asarray(m_shadow[k]))
    # the refreshed shadow equals a fresh cast of the final masters (exact)
    refreshed = bf16_param_shadow(shadowed.params)
    assert set(shadowed.params_bf16) == set(refreshed)
    for k in refreshed:
        np.testing.assert_array_equal(np.asarray(shadowed.params_bf16[k]),
                                      np.asarray(refreshed[k]))


def test_shadow_on_mesh_matches_single(setup):
    """DP mesh with the shadow = single-device shadow run, loss-identical:
    the shadow leaves inherit the replicated param shardings through the
    cast, and the SPMD step's all-reduced grads produce the same update."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from xggm_tpu.parallel.mesh import make_mesh

    cfg, model, tx, params, _ = setup
    from __graft_entry__ import _make_batch
    batch = _make_batch(np.random.RandomState(7), 8,  # divisible by 8 devs
                        cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    step = make_ggm_train_step(model, tx, cfg.train, "representation")
    params_host = jax.tree.map(np.asarray, params)

    losses = {}
    for on_mesh in (False, True):
        if on_mesh:
            mesh = make_mesh(n_devices=8, model_parallel=1)
            p = jax.device_put(
                jax.tree.map(jnp.asarray, params_host),
                NamedSharding(mesh, P()))
            b = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
                batch)
        else:
            p = jax.tree.map(jnp.asarray, params_host)
            b = batch
        state = TrainState(p, tx.init(p), bf16_param_shadow(p))
        _, m = step(state, b, jax.random.PRNGKey(11))
        losses[on_mesh] = (float(m["clean_loss"]), float(m["ggm_loss"]))
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_equivalent_clean_step(setup):
    cfg, model, tx, params, batch = setup
    step = make_clean_train_step(model, tx, cfg.train, cfg.num_answers)
    fresh = lambda: jax.tree.map(jnp.array, params)  # noqa: E731
    p0 = fresh()
    plain, _ = _run([step], TrainState(p0, tx.init(p0)), batch, n=2)
    p1 = fresh()
    shadowed, _ = _run(
        [step], TrainState(p1, tx.init(p1), bf16_param_shadow(p1)), batch,
        n=2)
    _assert_params_close(plain.params, shadowed.params)
