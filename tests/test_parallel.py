"""SPMD sharding rules: TP param shardings + full-step parity DP vs DP+TP."""
import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from xggm_tpu.parallel.mesh import make_mesh, param_shardings, pad_batch_to


def test_param_shardings_rules():
    mesh = make_mesh(model_parallel=2)
    params = {"params": {
        "wide": {"kernel": np.zeros((64, 4096), np.float32),
                 "bias": np.zeros((4096,), np.float32)},
        "narrow": {"kernel": np.zeros((64, 64), np.float32),
                   "bias": np.zeros((64,), np.float32)},
        "odd": {"kernel": np.zeros((64, 4097), np.float32)},  # indivisible
    }}
    sh = param_shardings(params, mesh, min_model_dim=2048)
    t = sh["params"]
    assert t["wide"]["kernel"].spec == P(None, "model")
    assert t["wide"]["bias"].spec == P("model")
    assert t["narrow"]["kernel"].spec == P()
    assert t["odd"]["kernel"].spec == P()


def test_dp_vs_dptp_step_parity():
    """The same train step on a pure-DP mesh and a DP x TP mesh must produce
    (numerically) the same losses."""
    import __graft_entry__ as g
    from xggm_tpu.config import tiny_test_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step
    from jax.sharding import NamedSharding

    cfg = tiny_test_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    batch = g._make_batch(rng, 8, cfg.lxmert.bert.vocab_size,
                          cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    params0 = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)

    losses = {}
    # host copies: the donated step would otherwise invalidate params0's
    # buffers through device_put's device-0 shard aliasing
    params_host = jax.tree.map(lambda x: np.asarray(x), params0)
    for mp in (1, 2):
        mesh = make_mesh(n_devices=8, model_parallel=mp)
        psh = param_shardings(params_host, mesh, min_model_dim=64)
        params = jax.tree.map(jax.device_put, params_host, psh)
        tx = bert_adam(lr=1e-4, warmup=0.1, t_total=100)
        state = TrainState(params, tx.init(params))
        b = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
            batch)
        step = make_ggm_train_step(model, tx, cfg.train, "representation")
        _, m = step(state, b, jax.random.PRNGKey(5))
        losses[mp] = (float(m["clean_loss"]), float(m["ggm_loss"]))
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-4)


def test_step_hlo_contains_gradient_allreduce():
    """The SPMD partitioner must insert cross-device reduction collectives
    for the gradients (the XLA equivalent of DataParallel's grad sync,
    reference entry.py:103-104) - assert on the compiled HLO so a sharding
    regression can't silently fall back to replicated compute."""
    import __graft_entry__ as g
    from xggm_tpu.config import tiny_test_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step
    from jax.sharding import NamedSharding

    cfg = tiny_test_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    batch = g._make_batch(rng, 8, cfg.lxmert.bert.vocab_size,
                          cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    mesh = make_mesh(n_devices=8, model_parallel=1)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    tx = bert_adam(lr=1e-4, warmup=0.1, t_total=100)
    state = TrainState(params, tx.init(params))
    batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    step = make_ggm_train_step(model, tx, cfg.train, "relation")
    hlo = step.lower(state, batch, jax.random.PRNGKey(0)) \
              .compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the SPMD step"


def test_pad_batch_to():
    batch = {"a": np.arange(6).reshape(3, 2), "b": np.ones((3,))}
    padded, mask = pad_batch_to(batch, 5)
    assert padded["a"].shape == (5, 2)
    assert mask.tolist() == [True, True, True, False, False]
