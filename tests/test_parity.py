"""Numeric parity vs the reference PyTorch implementation.

Golden fixtures in tests/goldens/*.npz are produced by tools/make_goldens.py
from the reference repo (state dicts + fixed inputs + outputs, eval mode).
These tests push the same weights through the torch->JAX bridge and assert
our outputs match within float32 tolerance - covering the encoder stack, all
three GGM generators, BertAdam (including its schedule quirks), and the loss
reductions.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xggm_tpu.checkpoint.torch_bridge import (
    convert_lxrt_bert, unflatten_params, strip_prefixes,
)
from xggm_tpu.config import BertConfig, LxmertConfig, VisualConfig

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

TINY_CFG = LxmertConfig(
    bert=BertConfig(vocab_size=128, hidden_size=64, num_attention_heads=4,
                    intermediate_size=128, max_position_embeddings=64),
    visual=VisualConfig(l_layers=2, x_layers=1, r_layers=1,
                        visual_feat_dim=32, visual_pos_dim=4),
)


def load_golden(name):
    data = np.load(os.path.join(GOLDENS, name))
    sd = {k[len("sd::"):]: data[k] for k in data.files if k.startswith("sd::")}
    rest = {k: data[k] for k in data.files if not k.startswith("sd::")}
    return sd, rest


def test_lxrt_forward_parity():
    from xggm_tpu.models.lxmert import LxmertModel

    sd, g = load_golden("lxrt_tiny.npz")
    flat, mapper = convert_lxrt_bert(strip_prefixes(sd), TINY_CFG,
                                     torch_prefix="", our_prefix="lxrt")
    assert not mapper.missing, f"missing torch keys: {mapper.missing[:5]}"
    unused = set(sd.keys()) - mapper.used
    assert not unused, f"unconverted torch keys: {sorted(unused)[:5]}"

    # re-root: fixture maps to 'lxrt/...' but the bare model tree has no root
    flat = {k[len("lxrt/"):]: v for k, v in flat.items()}
    params = unflatten_params(flat)

    model = LxmertModel(TINY_CFG)
    (lang, visn), pooled = model.apply(
        params, g["input_ids"], g["input_mask"], g["segment_ids"],
        g["feats"], g["boxes"], deterministic=True)

    np.testing.assert_allclose(np.asarray(pooled), g["out_pooled"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lang), g["out_lang"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(visn), g["out_visn"],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind,n_layers", [("gcn", 2), ("gin", 2), ("gat", 1)])
def test_generator_parity(kind, n_layers):
    from xggm_tpu.ggm.generators import GCNGenerator, GINGenerator, GATGenerator

    sd, g = load_golden(f"ggm_{kind}_tiny.npz")
    # reuse the task-model generator mapping by prefixing keys
    sd_pref = {f"generator.{k}": v for k, v in sd.items()}
    from xggm_tpu.checkpoint.torch_bridge import _Mapper, _map_gcn, _map_gin
    m = _Mapper(sd_pref)
    if kind == "gcn":
        for i in range(n_layers):
            _map_gcn(m, f"generator.gnn_layers.{i}", f"gnn_{i}", n_convs=2)
        gen = GCNGenerator(hidden_dim=64, n_layers=n_layers)
    elif kind == "gin":
        for i in range(n_layers):
            _map_gin(m, f"generator.gnn_layers.{i}", f"gnn_{i}", n_convs=1)
        gen = GINGenerator(hidden_dim=64, n_layers=n_layers)
    else:
        for i in range(n_layers):
            for h in range(2):
                th = f"generator.gnn_layers.{i}.gat_layers.{h}"
                oh = f"gnn_{i}/head_{h}"
                m.linear_nobias(f"{th}.linear_layer", f"{oh}/linear_layer")
                m.out[f"{oh}/attn"] = np.ascontiguousarray(
                    m.sd[f"{th}.attn_layer.weight"].T)
        gen = GATGenerator(hidden_dim=64, n_layers=n_layers, faithful_cat=True)
    assert not m.missing, m.missing[:5]
    params = unflatten_params(m.out)

    xo, ao = gen.apply(params, g["x"], g["adj"], True)
    np.testing.assert_allclose(np.asarray(xo), g["out_x"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ao), g["out_adj"], rtol=2e-5, atol=2e-5)


def test_bert_adam_parity():
    """Trajectory match incl. the pre-increment schedule (first step lr=0)
    and the per-group lr (w at base 4e-3, b overridden to 1e-3)."""
    from xggm_tpu.training.bert_adam import bert_adam

    _, g = load_golden("bert_adam.npz")
    params = {"w": jnp.asarray(g["w0"]), "b": jnp.asarray(g["b0"])}
    lr_scale = {"w": 1.0, "b": 1e-3 / 4e-3}
    tx = bert_adam(lr=4e-3, warmup=0.1, t_total=10, lr_scale=lr_scale)
    state = tx.init(params)
    for i in range(6):
        grads = {"w": jnp.asarray(g["grads_w"][i]),
                 "b": jnp.asarray(g["grads_b"][i])}
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]), g["traj_w"][i],
                                   rtol=1e-5, atol=1e-6, err_msg=f"step {i} w")
        np.testing.assert_allclose(np.asarray(params["b"]), g["traj_b"][i],
                                   rtol=1e-5, atol=1e-6, err_msg=f"step {i} b")
    # quirk check: step 0 must be a no-op (lr = warmup_linear(0) = 0)
    np.testing.assert_allclose(g["traj_w"][0], g["w0"], atol=0)


def test_loss_parity():
    from xggm_tpu.ops.losses import (
        bce_with_logits, symmetric_kl, score_matching_loss)

    _, g = load_golden("losses.npz")
    sm = score_matching_loss(jnp.asarray(g["score"]), jnp.asarray(g["grad"]),
                             float(g["sigma"]))
    np.testing.assert_allclose(float(sm), float(g["sm"]), rtol=1e-6)
    kl = symmetric_kl(jnp.asarray(g["klx"]), jnp.asarray(g["kly"]))
    np.testing.assert_allclose(float(kl), float(g["kl"]), rtol=1e-6)
    bce = bce_with_logits(jnp.asarray(g["logits"]), jnp.asarray(g["target"]))
    np.testing.assert_allclose(float(bce), float(g["bce"]), rtol=1e-6)


def test_task_glue_parity():
    """Task-model glue heads vs reference-built torch modules: logit_fc,
    encoder_adj (incl. triu scatter + symmetrize), node_fc tiling,
    fusion_fc([x, tanh(mean(nodes))])."""
    import jax.numpy as jnp

    from xggm_tpu.checkpoint.torch_bridge import (
        _Mapper, _map_linear_gelu_ln, unflatten_params)
    from xggm_tpu.models.lxmert import AnswerHead
    from xggm_tpu.models.task_model import NodeFC, triu_to_adjacency

    sd, g = load_golden("task_glue_tiny.npz")
    m = _Mapper(sd)
    m.linear("logit_fc.0", "logit_fc/fc1")
    m.layernorm("logit_fc.2", "logit_fc/ln")
    m.linear("logit_fc.3", "logit_fc/fc2")
    m.linear("encoder_adj.0", "encoder_adj")
    _map_linear_gelu_ln(m, "node_fc", "node_fc")
    _map_linear_gelu_ln(m, "fusion_fc", "fusion_fc")
    assert not m.missing
    flat = m.out
    x = jnp.asarray(g["x"])
    nodes = jnp.asarray(g["nodes"])

    head = AnswerHead(hidden_size=64, num_answers=16)
    p = unflatten_params({k[len("logit_fc/"):]: v for k, v in flat.items()
                          if k.startswith("logit_fc/")})
    logits = head.apply(p, x)
    np.testing.assert_allclose(np.asarray(logits), g["out_logits"],
                               rtol=2e-5, atol=2e-5)

    # encoder_adj: sigmoid(Wx) scattered to triu + symmetrized
    w = jnp.asarray(flat["encoder_adj/kernel"])
    b = jnp.asarray(flat["encoder_adj/bias"])
    vals = jax.nn.sigmoid(x @ w + b)
    adj = triu_to_adjacency(vals)
    np.testing.assert_allclose(np.asarray(adj), g["out_adj"],
                               rtol=2e-5, atol=2e-5)

    node_fc = NodeFC(features=64)
    p = unflatten_params({k[len("node_fc/"):]: v for k, v in flat.items()
                          if k.startswith("node_fc/")})
    tiled = jnp.repeat(x[:, None, :], 36, axis=1)
    node_out = node_fc.apply(p, tiled)
    np.testing.assert_allclose(np.asarray(node_out), g["out_node"],
                               rtol=2e-5, atol=2e-5)

    fusion = NodeFC(features=64)
    p = unflatten_params({k[len("fusion_fc/"):]: v for k, v in flat.items()
                          if k.startswith("fusion_fc/")})
    summary = jnp.tanh(jnp.mean(nodes, axis=1))
    x_gen = fusion.apply(p, jnp.concatenate([x, summary], axis=-1))
    np.testing.assert_allclose(np.asarray(x_gen), g["out_xgen"],
                               rtol=2e-5, atol=2e-5)


def test_stacked_unstacked_equivalence():
    """config.stacked_layers is a pure param-LAYOUT change: the same weights
    must give identical forward outputs and identical gradients through the
    scan VJP. The stacked path is a measured-and-rejected DEFAULT
    (docs/PERF.md ledger: 102.8 vs 90.2 ms step even fully unrolled) kept as
    a tested opt-in - this pins its numerics so it stays usable."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    from xggm_tpu.checkpoint.torch_bridge import stack_encoder_flat
    from xggm_tpu.models.lxmert import LxmertModel

    cfg_u = TINY_CFG.replace(stacked_layers=False)
    cfg_s = TINY_CFG.replace(stacked_layers=True)
    rng = np.random.RandomState(0)
    B, L, N = 2, 8, 5
    ids = rng.randint(1, 128, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    seg = np.zeros((B, L), np.int32)
    feats = rng.randn(B, N, 32).astype(np.float32)
    boxes = rng.rand(B, N, 4).astype(np.float32)

    model_u, model_s = LxmertModel(cfg_u), LxmertModel(cfg_s)
    params_u = model_u.init(jax.random.PRNGKey(0), ids, mask, seg,
                            feats, boxes)

    def to_flat(tree):
        return {"lxrt/" + "/".join(k): np.asarray(v)
                for k, v in flatten_dict(tree["params"]).items()}

    def from_flat(flat):
        return {"params": unflatten_dict(
            {tuple(k[len("lxrt/"):].split("/")): jnp.asarray(v)
             for k, v in flat.items()})}

    params_s = from_flat(stack_encoder_flat(to_flat(params_u), cfg_s))
    ref_s = model_s.init(jax.random.PRNGKey(1), ids, mask, seg, feats, boxes)
    assert (jax.tree.map(jnp.shape, params_s)
            == jax.tree.map(jnp.shape, ref_s))

    def fwd(model, params):
        (lang, visn), pooled = model.apply(params, ids, mask, seg,
                                           feats, boxes, deterministic=True)
        return lang, visn, pooled

    for a, b, nm in zip(fwd(model_u, params_u), fwd(model_s, params_s),
                        ("lang", "visn", "pooled")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=nm)

    # VJP path (the delicate part of the scan transform): grads agree
    # leaf-for-leaf after restacking the per-layer grads.
    def loss(model):
        def f(p):
            lang, visn, pooled = fwd(model, p)
            return jnp.sum(lang ** 2) + jnp.sum(visn ** 2) + \
                jnp.sum(pooled ** 2)
        return f

    g_u = stack_encoder_flat(to_flat(jax.grad(loss(model_u))(params_u)),
                             cfg_s)
    g_s = to_flat(jax.grad(loss(model_s))(params_s))
    assert set(g_u) == set(g_s)
    for k in sorted(g_u):
        # fp32 accumulation order differs across the two layouts (scan
        # stacks the per-layer contributions before the embedding-grad
        # reduce) - tolerance covers reassociation only, not real drift.
        np.testing.assert_allclose(g_s[k], g_u[k], rtol=1e-4, atol=5e-5,
                                   err_msg=k)
