"""ZeRO-style optimizer-state sharding (parallel/mesh.zero_state_shardings).

The reference has no distributed optimizer (its DataParallel keeps gradient
math on device 0, src/lxrt/entry.py:103-104); this layer is TPU-native
scale-out: BertAdam's fp32 m/v moments - and the fp32 masters whose compute
copies live in the bf16 shadow - shard over the mesh's 'data' axis, so each
chip holds 1/N of the optimizer state. Pinned here on the virtual 8-device
CPU mesh: per-leaf placement rules, numerical equivalence of the sharded
step, actual per-device memory reduction, and host snapshotability (the
checkpoint path)."""
import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from xggm_tpu.config import tiny_test_config
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.parallel.mesh import (
    apply_state_shardings, make_mesh, param_shardings, zero_state_shardings)
from xggm_tpu.training.bert_adam import bert_adam
from xggm_tpu.training.steps import (
    TrainState, bf16_param_shadow, make_ggm_train_step)


def _setup(bf16=True):
    import __graft_entry__ as g

    cfg = tiny_test_config()
    if bf16:
        cfg = cfg.replace(lxmert=cfg.lxmert.replace(dtype="bfloat16"))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    batch = g._make_batch(rng, 8, cfg.lxmert.bert.vocab_size,
                          cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    return cfg, model, batch, params


def test_zero_shardings_layout():
    """Placement rules: moments data-sharded (TP leaves keep 'model' too),
    masters data-sharded ONLY when their compute copy is in the shadow,
    shadow leaves keep the params' original spec, scalars replicate."""
    cfg, model, batch, params = _setup(bf16=True)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    psh = param_shardings(params, mesh, min_model_dim=128)
    tx = bert_adam(lr=1e-4, warmup=0.1, t_total=100)
    state = TrainState(params, tx.init(params), bf16_param_shadow(params))
    ssh = zero_state_shardings(state, mesh, psh)

    flat_m = {"/".join(str(getattr(k, "key", k)) for k in path): s
              for path, s in jax.tree_util.tree_leaves_with_path(ssh.opt_state.m)}
    flat_p = {"/".join(str(getattr(k, "key", k)) for k in path): s
              for path, s in jax.tree_util.tree_leaves_with_path(ssh.params)}
    # a plain (non-TP) Dense kernel: moment gets 'data' on its first dim
    key_q = next(k for k in flat_m
                 if k.endswith("mlp/output/kernel") and "layer_0" in k)
    assert flat_m[key_q].spec[0] == "data"
    # the wide FFN intermediate kernel [64, 128] is TP on 'model' (threshold
    # 128): its moment carries BOTH axes
    key_w = next(k for k in flat_m
                 if k.endswith("mlp/intermediate/kernel") and "layer_0" in k)
    assert flat_m[key_w].spec == P("data", "model")
    # shadowed master (bf16-consumed Dense kernel): data-sharded
    assert flat_p[key_q].spec[0] == "data"
    # fp32-consumed masters (LayerNorm scale, embedding tables) stay put -
    # the forward reads them directly
    key_ln = next(k for k in flat_p if "layernorm" in k.lower()
                  and k.endswith("scale"))
    key_emb = next(k for k in flat_p if k.endswith("embedding"))
    assert "data" not in tuple(flat_p[key_ln].spec)
    assert "data" not in tuple(flat_p[key_emb].spec)
    # shadow leaves: original param spec (replicated or TP), never 'data'
    for k, s in ssh.params_bf16.items():
        assert "data" not in tuple(s.spec), k
    # scalar bookkeeping replicates
    assert all(s.spec == P()
               for s in jax.tree.leaves(ssh.opt_state.leaf_count))
    assert ssh.opt_state.count.spec == P()


def test_zero_step_parity_fp32():
    """fp32 compute (no shadow): the sharded step matches the replicated one
    to reduction-order noise - the optimizer math is elementwise; only the
    gradient reduce-scatter's summation order differs. (Under bf16 compute
    the same comparison sits in the bf16-rounding envelope instead: Adam's
    scale-free update turns cotangent rounding into ~1% drift on small
    leaves, the same class as tests/test_bf16_shadow.py.)"""
    from jax.sharding import NamedSharding

    cfg, model, batch, params = _setup(bf16=False)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    psh = param_shardings(params, mesh, min_model_dim=128)
    params_host = jax.tree.map(np.asarray, params)
    data_sh = NamedSharding(mesh, P("data"))
    batch_m = jax.tree.map(lambda x: jax.device_put(x, data_sh), batch)

    results = {}
    for zero in (False, True):
        p = jax.tree.map(jax.device_put, params_host, psh)
        tx = bert_adam(lr=1e-3, warmup=0.1, t_total=100)
        state = TrainState(p, tx.init(p))
        ssh = zero_state_shardings(state, mesh, psh) if zero else None
        if zero:
            state = apply_state_shardings(state, ssh)
        step = make_ggm_train_step(model, tx, cfg.train, "relation",
                                   state_shardings=ssh)
        for i in range(3):  # donation across steps
            state, metrics = step(state, batch_m, jax.random.PRNGKey(i))
        results[zero] = (state, metrics)

    m0, m1 = results[False][1], results[True][1]
    np.testing.assert_allclose(float(m0["clean_loss"]),
                               float(m1["clean_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m0["ggm_loss"]),
                               float(m1["ggm_loss"]), rtol=1e-5)
    s0, s1 = results[False][0], results[True][0]
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        denom = max(float(np.linalg.norm(b)), 1e-6)
        assert float(np.linalg.norm(a - b)) / denom < 1e-4


def test_zero_memory_donation_eval_bf16():
    """Production layout (bf16 shadow + ZeRO): each device holds 1/4 of a
    data-sharded moment AND of a shadowed fp32 master, donation keeps
    working across steps, the state stays host-snapshotable (checkpoint
    path), and eval reads the replicated shadow."""
    from jax.sharding import NamedSharding

    cfg, model, batch, params = _setup(bf16=True)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    psh = param_shardings(params, mesh, min_model_dim=128)
    data_sh = NamedSharding(mesh, P("data"))
    batch_m = jax.tree.map(lambda x: jax.device_put(x, data_sh), batch)

    tx = bert_adam(lr=1e-3, warmup=0.1, t_total=100)
    state = TrainState(params, tx.init(params), bf16_param_shadow(params))
    ssh = zero_state_shardings(state, mesh, psh)
    state = apply_state_shardings(state, ssh)
    step = make_ggm_train_step(model, tx, cfg.train, "relation",
                               state_shardings=ssh)
    for i in range(3):  # donation across steps
        state, metrics = step(state, batch_m, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["clean_loss"]))
    assert np.isfinite(float(metrics["ggm_loss"]))

    # memory: a data-sharded moment leaf holds 1/4 per device (data axis = 4)
    flat_m = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
              for path, leaf
              in jax.tree_util.tree_leaves_with_path(state.opt_state.m)}
    leaf = next(v for k, v in flat_m.items()
                if k.endswith("mlp/output/kernel") and "layer_0" in k)
    assert leaf.sharding.spec[0] == "data"
    assert leaf.addressable_shards[0].data.size == leaf.size // 4
    # sharded masters too (shadowed leaf)
    flat_p = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
              for path, leaf
              in jax.tree_util.tree_leaves_with_path(state.params)}
    master = next(v for k, v in flat_p.items()
                  if k.endswith("mlp/output/kernel") and "layer_0" in k)
    assert master.addressable_shards[0].data.size == master.size // 4

    # the checkpoint snapshot path (manager._host_copy) must see fully-
    # addressable arrays: device_get works on the sharded state
    host = jax.device_get({"params": state.params,
                           "opt_state": state.opt_state})
    assert host["params"] is not None

    # eval path: predict from the shadow-overlaid tree still works
    from xggm_tpu.training.steps import _apply_params, make_eval_step
    preds = make_eval_step(model)(_apply_params(state), batch_m)
    assert np.asarray(preds).shape == (8,)


def test_zero_moment_fallbacks():
    """Leaves with no 'data'-divisible dim stay replicated; TP biases keep
    their 'model' spec (no free dim left)."""
    from xggm_tpu.parallel.mesh import _with_data_axis

    assert _with_data_axis(P(), (64, 64), 4) == P("data", None)
    assert _with_data_axis(P(None, "model"), (64, 128), 4) == P("data", "model")
    assert _with_data_axis(P("model"), (128,), 4) == P("model")
    assert _with_data_axis(P(), (3, 5), 4) == P(None, None)  # indivisible
    assert _with_data_axis(P(), (), 4) == P()          # scalar


def test_zero_trajectory_envelope_bf16_shadow():
    """The SHIPPING config's parity claim, pinned (was prose in docs/PERF.md
    / CLAUDE.md): under bf16 compute + param shadow, the ZeRO-sharded
    trajectory tracks the replicated one within a bounded envelope over
    multiple steps of both GGM branches.

    Not bit-parity: the reduce-scattered gradient summation order differs
    between layouts, and Adam's scale-free update (m/(sqrt(v)+eps), lr
    decoupled from grad scale) amplifies bf16 cotangent rounding to ~1%
    relative on small leaves. The bound is a per-leaf relative L2 norm
    (same discipline as tests/test_bf16_shadow._assert_params_close), plus
    a loss-level check per step."""
    from jax.sharding import NamedSharding

    cfg, model, batch8, params = _setup(bf16=True)
    import __graft_entry__ as g

    batch = g._make_batch(np.random.RandomState(3), 8,
                          cfg.lxmert.bert.vocab_size,
                          cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    psh = param_shardings(params, mesh, min_model_dim=128)
    params_host = jax.tree.map(np.asarray, params)
    data_sh = NamedSharding(mesh, P("data"))
    batch_m = jax.tree.map(lambda x: jax.device_put(x, data_sh), batch)

    results = {}
    for zero in (False, True):
        p = jax.tree.map(jax.device_put, params_host, psh)
        tx = bert_adam(lr=1e-3, warmup=0.1, t_total=100)
        state = TrainState(p, tx.init(p), bf16_param_shadow(p))
        ssh = zero_state_shardings(state, mesh, psh) if zero else None
        if zero:
            state = apply_state_shardings(state, ssh)
        steps = [make_ggm_train_step(model, tx, cfg.train, b,
                                     state_shardings=ssh)
                 for b in ("relation", "representation")]
        losses = []
        for i in range(4):
            state, metrics = steps[i % 2](state, batch_m,
                                          jax.random.PRNGKey(i))
            losses.append((float(metrics["clean_loss"]),
                           float(metrics["ggm_loss"])))
        results[zero] = (state, losses)

    # per-step losses stay within the bf16 envelope
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=2e-2, atol=1e-3)
    # final masters: per-leaf relative L2 envelope (~1% small-leaf drift)
    for a, b in zip(jax.tree.leaves(results[False][0].params),
                    jax.tree.leaves(results[True][0].params)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        diff = np.linalg.norm(a - b)
        ref = np.linalg.norm(a)
        assert diff <= 3e-2 * ref + 2e-5, (diff, ref, a.shape)
