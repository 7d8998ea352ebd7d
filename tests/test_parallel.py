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


def test_stacked_param_shardings():
    """Scan-stacked [L, in, out] kernels shard their output dim over 'model'
    (P(None, None, 'model')); stacked [L, out] biases follow."""
    mesh = make_mesh(model_parallel=2)
    params = {"params": {
        "stacked": {"kernel": np.zeros((9, 64, 4096), np.float32),
                    "bias": np.zeros((9, 4096), np.float32)},
        "narrow": {"kernel": np.zeros((9, 64, 64), np.float32),
                   "bias": np.zeros((9, 64), np.float32)},
    }}
    sh = param_shardings(params, mesh, min_model_dim=2048)
    t = sh["params"]
    assert t["stacked"]["kernel"].spec == P(None, None, "model")
    assert t["stacked"]["bias"].spec == P(None, "model")
    assert t["narrow"]["kernel"].spec == P()
    assert t["narrow"]["bias"].spec == P()


def test_pallas_attention_partitions_on_mesh():
    """The fused attention kernels carry custom_partitioning rules: on an
    8-device mesh the forward and backward match the single-device result
    bitwise (pure batch parallelism), and the in-kernel-dropout variant's
    VJP stays self-consistent (finite-difference check) per shard."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding

    from xggm_tpu.ops.pallas_attention import mha_pallas, mha_pallas_dropout

    B, H, Lq, Lk, D = 8, 4, 16, 24, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, Lq, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Lk, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Lk, D), jnp.float32)
    npmask = np.ones((B, Lk))
    npmask[:, 20:] = 0
    bias = jnp.asarray(((1 - npmask) * -10000.0)[:, None, None, :],
                       jnp.float32)

    out_s = jax.jit(mha_pallas)(q, k, v, bias)
    grad_s = jax.jit(jax.grad(
        lambda q, k, v: mha_pallas(q, k, v, bias).sum(),
        argnums=(0, 1, 2)))(q, k, v)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out_m = jax.jit(mha_pallas)(qs, ks, vs, bias)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_s))
    grad_m = jax.jit(jax.grad(
        lambda q, k, v: mha_pallas(q, k, v, bias).sum(),
        argnums=(0, 1, 2)))(qs, ks, vs)
    for a, b in zip(grad_m, grad_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # dropout variant: deterministic per seed + VJP consistent on the mesh
    seed = jnp.int32(7)

    def f(v_):
        return mha_pallas_dropout(qs, ks, v_, bias, seed, 0.3).sum()

    f_jit = jax.jit(f)
    assert float(f_jit(vs)) == float(f_jit(vs))
    g = jax.jit(jax.grad(f))(vs)
    dirn = jnp.asarray(rng.randn(*v.shape), jnp.float32)
    eps = 1e-3
    fd = (float(f_jit(vs + eps * dirn)) - float(f_jit(vs - eps * dirn))) \
        / (2 * eps)
    an = float(jnp.vdot(g, dirn))
    assert abs(fd - an) / max(abs(fd), 1e-6) < 5e-3, (fd, an)
