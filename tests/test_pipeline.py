"""Pipeline parallelism (parallel/pipeline.gpipe_apply): forward and
gradient equivalence with the sequential stack, on the virtual 8-device CPU
mesh. Microbatching is exact for per-example layers, so the comparisons are
tight-tolerance rather than statistical."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from xggm_tpu.parallel.pipeline import (
    gpipe_apply, sequential_apply, stack_stages)


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


def _mlp_layer(p, x, _extra):
    return jnp.tanh(x @ p["w"] + p["b"])


def _mlp_stack(L, d, key):
    ks = jax.random.split(key, 2 * L)
    return {
        "w": jnp.stack([jax.random.normal(ks[i], (d, d)) * 0.3
                        for i in range(L)]),
        "b": jnp.stack([jax.random.normal(ks[L + i], (d,)) * 0.1
                        for i in range(L)]),
    }


def test_stack_stages_shapes():
    params = {"w": jnp.zeros((8, 4, 4)), "b": jnp.zeros((8, 4))}
    staged = stack_stages(params, 4)
    assert staged["w"].shape == (4, 2, 4, 4)
    assert staged["b"].shape == (4, 2, 4)
    try:
        stack_stages(params, 3)
        raise AssertionError("expected ValueError for indivisible stack")
    except ValueError:
        pass


def test_gpipe_forward_matches_sequential():
    """8 layers over 4 stages, 16 rows in 8 microbatches (M > S: the
    steady-state pipeline, not just the fill/drain edges)."""
    mesh = _pipe_mesh(4)
    L, d, B, M = 8, 16, 16, 8
    params = _mlp_stack(L, d, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d))

    ref = sequential_apply(_mlp_layer, params, x)
    out = jax.jit(lambda p, x: gpipe_apply(
        _mlp_layer, p, x, mesh, n_microbatches=M))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_8_stages_m_equals_s():
    """All 8 devices as stages, M == S (pure fill/drain schedule)."""
    mesh = _pipe_mesh(8)
    L, d, B, M = 8, 8, 8, 8
    params = _mlp_stack(L, d, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (B, d))
    ref = sequential_apply(_mlp_layer, params, x)
    out = jax.jit(lambda p, x: gpipe_apply(
        _mlp_layer, p, x, mesh, n_microbatches=M))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_gradients_match_sequential():
    """jax.grad through the pipeline (reverse pipeline via AD transposes of
    scan + ppermute) equals the sequential stack's gradients."""
    mesh = _pipe_mesh(4)
    L, d, B, M = 4, 8, 8, 4
    params = _mlp_stack(L, d, jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (B, d))
    tgt = jax.random.normal(jax.random.PRNGKey(6), (B, d))

    def loss_pipe(p):
        y = gpipe_apply(_mlp_layer, p, x, mesh, n_microbatches=M)
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(p):
        y = sequential_apply(_mlp_layer, p, x)
        return jnp.mean((y - tgt) ** 2)

    gp = jax.jit(jax.grad(loss_pipe))(params)
    gs = jax.jit(jax.grad(loss_seq))(params)
    np.testing.assert_allclose(float(jax.jit(loss_pipe)(params)),
                               float(jax.jit(loss_seq)(params)), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_real_bert_layer():
    """The actual BertLayer (models/lxmert.py) as the pipelined body: an
    8-layer stack over 4 stages matches the sequential stack, attention
    bias broadcast as `extra`."""
    from xggm_tpu.config import tiny_test_config
    from xggm_tpu.models.lxmert import BertLayer

    cfg = tiny_test_config().lxmert.bert
    layer = BertLayer(cfg, jnp.float32)
    B, Lseq, d, Lstack, M = 8, 12, cfg.hidden_size, 8, 4
    mesh = _pipe_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, Lseq, d))
    # batch-independent bias ([1,1,1,L]): `extra` broadcasts unsliced to
    # every microbatch, so it must not carry a batch dim
    mask = np.zeros((1, 1, 1, Lseq), np.float32)
    mask[:, :, :, 10:] = -10000.0
    bias = jnp.asarray(mask)

    stacked = jax.tree.map(
        lambda *ls: jnp.stack(ls),
        *[layer.init(jax.random.PRNGKey(10 + i), x[:1], bias, True)
          for i in range(Lstack)])

    def apply_one(p, h, b):
        return layer.apply(p, h, b, True)

    ref = sequential_apply(apply_one, stacked, x, extra=bias)
    out = jax.jit(lambda p, h: gpipe_apply(
        apply_one, p, h, mesh, n_microbatches=M, extra=bias))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gpipe_composes_with_data_parallelism():
    """dp x pp on one ('data', 'pipe') mesh: microbatch rows shard over
    'data' while stages pipeline over 'pipe'; output matches the sequential
    stack, and gradients through the composed layout match too."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "pipe"))
    L, d, B, M = 8, 16, 16, 4
    params = _mlp_stack(L, d, jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (B, d))

    ref = sequential_apply(_mlp_layer, params, x)
    run = jax.jit(lambda p, x: gpipe_apply(
        _mlp_layer, p, x, mesh, n_microbatches=M, batch_axis="data"))
    out = run(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    g_pipe = jax.jit(jax.grad(lambda p: jnp.sum(gpipe_apply(
        _mlp_layer, p, x, mesh, n_microbatches=M,
        batch_axis="data") ** 2)))(params)
    g_seq = jax.jit(jax.grad(lambda p: jnp.sum(
        sequential_apply(_mlp_layer, p, x) ** 2)))(params)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_per_layer_aux_through_params_tree():
    """Training-style usage: per-layer aux (dropout seeds here) rides the
    stacked params tree - the runner scans ANY [L, ...]-leading leaf, so
    layer i sees its own seed without API changes. Pinned vs sequential."""
    mesh = _pipe_mesh(4)
    L, d, B, M = 4, 8, 8, 4
    base = _mlp_stack(L, d, jax.random.PRNGKey(10))
    params = dict(base, seed=jnp.arange(L, dtype=jnp.uint32))

    def layer_with_dropout(p, x, _extra):
        h = jnp.tanh(x @ p["w"] + p["b"])
        # per-feature mask ([d], broadcast over rows): batch-shape-free, so
        # the draw is identical whether the layer sees a full batch or a
        # microbatch (a [batch, d] draw would differ by construction)
        keep = jax.random.bernoulli(
            jax.random.PRNGKey(p["seed"]), 0.8, (h.shape[-1],))
        return jnp.where(keep, h / 0.8, 0.0)

    x = jax.random.normal(jax.random.PRNGKey(11), (B, d))
    ref = sequential_apply(layer_with_dropout, params, x)
    out = jax.jit(lambda p, x: gpipe_apply(
        layer_with_dropout, p, x, mesh, n_microbatches=M))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_bf16_layer_with_fp32_input():
    """A bf16-emitting layer fed fp32 input: both runners cast the input up
    front (the scan carry needs one dtype), outputs are bf16 and equal."""
    mesh = _pipe_mesh(4)
    L, d, B, M = 4, 16, 8, 4
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          _mlp_stack(L, d, jax.random.PRNGKey(12)))

    def bf16_layer(p, x, _extra):
        return jnp.tanh(x.astype(jnp.bfloat16) @ p["w"] + p["b"])

    x = jax.random.normal(jax.random.PRNGKey(13), (B, d), jnp.float32)
    ref = sequential_apply(bf16_layer, params, x)
    out = jax.jit(lambda p, x: gpipe_apply(
        bf16_layer, p, x, mesh, n_microbatches=M))(params, x)
    assert ref.dtype == jnp.bfloat16 and out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)

    # a shape-changing layer is rejected loudly
    try:
        gpipe_apply(lambda p, h, _: h[..., : d // 2], params, x, mesh,
                    n_microbatches=M)
        raise AssertionError("expected ValueError for shape change")
    except ValueError as e:
        assert "changes the activation tree" in str(e)


def test_gpipe_stage_weight_placement():
    """Each stage's weights live only on its device: the staged leaves are
    P('pipe')-sharded, one stage slice per device."""
    from jax.sharding import NamedSharding

    mesh = _pipe_mesh(4)
    L, d = 8, 16
    params = _mlp_stack(L, d, jax.random.PRNGKey(7))
    staged = stack_stages(params, 4)
    placed = jax.device_put(staged, NamedSharding(mesh, P("pipe")))
    leaf = placed["w"]
    assert leaf.shape == (4, 2, d, d)
    assert leaf.addressable_shards[0].data.shape == (1, 2, d, d)
    assert len({s.device for s in leaf.addressable_shards}) == 4


# ---------------------------------------------------------------------------
# Heterogeneous pipeline: the REAL lang->visn->x encoder
# (parallel/pipeline_lxmert.py; reference modeling.py:559-606)
# ---------------------------------------------------------------------------


def _hetero_setup(pp_stages, dropout=0.0, n_mb=4):
    import dataclasses

    import __graft_entry__ as g
    from xggm_tpu.config import tiny_test_config
    from xggm_tpu.models.task_model import XGGMModel

    cfg = tiny_test_config()
    cfg = cfg.replace(
        lxmert=cfg.lxmert.replace(
            stacked_layers=True, pp_stages=pp_stages, pp_microbatches=n_mb,
            bert=dataclasses.replace(cfg.lxmert.bert,
                                     hidden_dropout_prob=dropout,
                                     attention_probs_dropout_prob=dropout)),
        ggm=dataclasses.replace(cfg.ggm, dropout=dropout))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    batch = g._make_batch(rng, 8, cfg.lxmert.bert.vocab_size,
                          cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    return cfg, model, batch


def test_superset_stack_layout():
    """kind/layer_id sequencing + stage padding of the superset build."""
    import jax.numpy as jnp
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.parallel.pipeline_lxmert import (
        KIND_IDENT, KIND_LANG, KIND_VISN, KIND_X, build_superset_stack)

    cfg, model, batch = _hetero_setup(pp_stages=0)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    enc = params["params"]["lxrt"]["encoder"]
    # 2 lang + 1 visn + 1 x = 4 layers; 3 stages pad to 6 with IDENT
    st = build_superset_stack(enc, n_stages=3)
    assert list(np.asarray(st["kind"])) == [
        KIND_LANG, KIND_LANG, KIND_VISN, KIND_X, KIND_IDENT, KIND_IDENT]
    assert list(np.asarray(st["layer_id"])) == list(range(6))
    # every slot leaf has the padded leading dim
    for leaf in jax.tree.leaves(st["slots"]):
        assert leaf.shape[0] == 6
    # the lang rows of the lang slots ARE the lang stack's params
    np.testing.assert_array_equal(
        np.asarray(st["slots"]["lang_self_att"]["self"]["qkv"]["kernel"][:2]),
        np.asarray(enc["lang_stack"]["layer"]["attention"]["self"]["qkv"]
                   ["kernel"]))
    # cross-attention rows of non-x layers are zero
    assert float(np.abs(np.asarray(
        st["slots"]["visual_attention"]["att"]["query"]["kernel"][:3])).max()) == 0


def test_hetero_encoder_fwd_and_grad_match_sequential():
    """Pipelined full-encoder fwd+grad == sequential (<1e-4): the composed
    clean_forward loss and its parameter gradients agree between the
    GPipe-scheduled encoder and the stacked sequential one on the same
    weights (deterministic)."""
    from jax.sharding import NamedSharding
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.ops.losses import bce_with_logits
    from xggm_tpu.parallel.mesh import make_mesh
    from xggm_tpu.parallel.pipeline_lxmert import set_pipeline_mesh

    cfg, model_pp, batch = _hetero_setup(pp_stages=4)
    model_seq = XGGMModel(cfg.lxmert.replace(pp_stages=0), cfg.ggm,
                          cfg.num_answers)
    mesh = make_mesh(n_devices=8, model_parallel=1, pipeline_parallel=4)
    set_pipeline_mesh(mesh, n_microbatches=4)
    params = model_seq.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    sh = NamedSharding(mesh, P("data"))
    bm = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    args5 = tuple(bm[k] for k in ("input_ids", "input_mask", "segment_ids",
                                  "feats", "boxes"))

    def loss(m):
        def f(p):
            logits = m.apply(p, *args5, deterministic=True,
                             method=XGGMModel.clean_forward)
            return bce_with_logits(logits, bm["target"])
        return f

    l_seq, g_seq = jax.value_and_grad(loss(model_seq))(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss(model_pp)))(params)
    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pp_train_step_parity_vs_dp_only():
    """VERDICT #2 'Done' check: the full two-phase GGM train step on a
    dp x pp mesh matches the dp-only run (same model semantics, dropout
    zeroed so the two paths' different RNG streams can't diverge)."""
    from jax.sharding import NamedSharding
    from xggm_tpu.parallel.mesh import make_mesh
    from xggm_tpu.parallel.pipeline_lxmert import set_pipeline_mesh
    from xggm_tpu.training.bert_adam import bert_adam
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step
    from xggm_tpu.models.task_model import XGGMModel

    cfg, model_pp, batch = _hetero_setup(pp_stages=4, dropout=0.0)
    model_seq = XGGMModel(cfg.lxmert.replace(pp_stages=0), cfg.ggm,
                          cfg.num_answers)
    params0 = model_seq.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    params_host = jax.tree.map(np.asarray, params0)

    results = {}
    for name, model, pp in (("dp", model_seq, 1), ("dp_pp", model_pp, 4)):
        mesh = make_mesh(n_devices=8, model_parallel=1, pipeline_parallel=pp)
        if pp > 1:
            set_pipeline_mesh(mesh, n_microbatches=4)
        p = jax.device_put(jax.tree.map(jnp.asarray, params_host),
                           NamedSharding(mesh, P()))
        tx = bert_adam(lr=1e-3, warmup=0.1, t_total=100)
        state = TrainState(p, tx.init(p))
        b = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
            batch)
        step = make_ggm_train_step(model, tx, cfg.train, "relation")
        state, m = step(state, b, jax.random.PRNGKey(5))
        results[name] = ((float(m["clean_loss"]), float(m["ggm_loss"])),
                         state)

    np.testing.assert_allclose(results["dp_pp"][0], results["dp"][0],
                               rtol=1e-4)
    # updated params agree too: gradient parity through the optimizer
    for a, b in zip(jax.tree.leaves(results["dp"][1].params),
                    jax.tree.leaves(results["dp_pp"][1].params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)
