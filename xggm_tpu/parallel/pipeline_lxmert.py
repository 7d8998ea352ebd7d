"""Heterogeneous GPipe schedule for the REAL LXMERT encoder.

The generic runner (parallel/pipeline.py) pipelines a homogeneous [L, ...]
stack; the flagship encoder is NOT homogeneous - it is the reference's
three-phase lang(9) -> visn(5) -> x(5) composition
(/root/reference/src/lxrt/modeling.py:559-606), with two different layer
types (BertLayer, LXRTXLayer) over two activation streams. This module
maps it onto the same GPipe machinery, TPU-native:

  * **uniform carry**: both streams ride one pytree
    {h: [B, Lt+Lv, H], lang_bias, visn_bias} through every stage - lang
    layers transform rows [:Lt], visn layers rows [Lt:], x layers both.
    The per-example attention biases travel WITH their microbatch (they
    are batch-dependent; `extra` broadcast would be wrong).
  * **superset layer params**: every virtual layer carries the XLayer
    param structure (visual_attention + lang/visn self-att + lang/visn
    mlp). A lang BertLayer occupies the (lang_self_att, lang_mlp) slots, a
    visn layer the visn slots, and the unused slots hold zeros whose
    branches are never executed (`lax.switch` runs only the taken branch
    on TPU, and AD gives their params exactly-zero gradients). This is
    what makes the stack SPMD-shardable over the pipe axis: every stage's
    weights are the same pytree of [L/S, ...] leaves.
  * **per-layer kind/id as stacked leaves**: `kind` in {LANG, VISN, X,
    IDENT} and `layer_id` ride the params tree, so each scanned slice
    knows which wiring to run and which dropout stream to fold in. The
    19-layer sequence pads with IDENT no-op layers to a stage-divisible
    length.

Gradient exactness: the mapping standard-params -> superset stack is pure
gather/concat (linear), built INSIDE the differentiated forward, so
jax.grad through the pipelined encoder yields the standard tree's
gradients directly - pinned against the sequential flax encoder by
tests/test_pipeline.py.

Dropout note: each microbatch draws its masks from the same per-layer key
(the schedule is microbatch-oblivious), so masks repeat across microbatches
within one step - statistically unbiased, not bit-equal to the sequential
full-batch draw. Parity tests run deterministic.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from xggm_tpu.parallel.pipeline import gpipe_apply

Array = jax.Array

KIND_LANG, KIND_VISN, KIND_X, KIND_IDENT = 0, 1, 2, 3

# ---------------------------------------------------------------------------
# Process-global pipeline context. The mesh is static at trace time but the
# flax model (models/lxmert.LxmertEncoder) has no channel to receive it per
# call - config dataclasses must stay hashable/serializable. Set ONCE per
# process (trainer/pretrainer/__graft_entry__ do) before building any
# train/eval step; it is not part of jit cache keys, so changing it between
# steps of one process is not supported.
# ---------------------------------------------------------------------------
_PP_CONTEXT: Optional[Dict[str, Any]] = None


def set_pipeline_mesh(mesh: Mesh, axis: str = "pipe",
                      batch_axis: Optional[str] = "data",
                      n_microbatches: int = 4) -> None:
    if axis not in mesh.shape:
        raise ValueError(f"mesh {dict(mesh.shape)} has no '{axis}' axis; "
                         f"build it with make_mesh(pipeline_parallel=N)")
    if batch_axis is not None and batch_axis not in mesh.shape:
        batch_axis = None  # pp-only mesh
    global _PP_CONTEXT
    _PP_CONTEXT = dict(mesh=mesh, axis=axis, batch_axis=batch_axis,
                       n_microbatches=n_microbatches)


def clear_pipeline_mesh() -> None:
    global _PP_CONTEXT
    _PP_CONTEXT = None


def get_pipeline_context() -> Dict[str, Any]:
    if _PP_CONTEXT is None:
        raise RuntimeError(
            "pp_stages > 1 but no pipeline mesh is set: call "
            "parallel.set_pipeline_mesh(mesh, ...) before building "
            "train/eval steps (the trainers do this when --pp is given)")
    return _PP_CONTEXT


# ---------------------------------------------------------------------------
# Superset stack construction
# ---------------------------------------------------------------------------

_SLOTS = ("visual_attention", "lang_self_att", "visn_self_att",
          "lang_mlp", "visn_mlp")


def _stack_len(tree) -> int:
    return jax.tree.leaves(tree)[0].shape[0]


def build_superset_stack(enc_params: Dict[str, Any],
                         n_stages: int) -> Dict[str, Any]:
    """Stacked-encoder params (lang_stack/r_stack/x_stack, the
    config.stacked_layers layout) -> one [L_pad, ...] superset stack with
    `kind` and `layer_id` leaves, L_pad divisible by n_stages."""
    lang = enc_params["lang_stack"]["layer"]  # BertLayer tree, [L_l, ...]
    visn = enc_params["r_stack"]["layer"]     # BertLayer tree, [L_r, ...]
    x = enc_params["x_stack"]["layer"]        # XLayer tree,    [L_x, ...]
    L_l, L_v, L_x = _stack_len(lang), _stack_len(visn), _stack_len(x)
    L = L_l + L_v + L_x
    L_pad = -(-L // n_stages) * n_stages
    pad = L_pad - L

    def rows(x_leaf, src_leaf, n_src, at):
        parts = []
        for n, here in ((L_l, at == "lang"), (L_v, at == "visn")):
            parts.append(src_leaf if here else
                         jnp.zeros((n,) + x_leaf.shape[1:], x_leaf.dtype))
        parts.append(x_leaf)
        if pad:
            parts.append(jnp.zeros((pad,) + x_leaf.shape[1:], x_leaf.dtype))
        return jnp.concatenate(parts, axis=0)

    # BertLayer's (attention, mlp) subtrees are structurally identical to
    # the XLayer's per-stream (self_att, mlp) slots (models/lxmert.py) -
    # map them in; cross-attention slots of non-x layers stay zero.
    slots = {
        "visual_attention": jax.tree.map(
            lambda xl: rows(xl, None, 0, "none"), x["visual_attention"]),
        "lang_self_att": jax.tree.map(
            lambda xl, sl: rows(xl, sl, L_l, "lang"),
            x["lang_self_att"], lang["attention"]),
        "visn_self_att": jax.tree.map(
            lambda xl, sl: rows(xl, sl, L_v, "visn"),
            x["visn_self_att"], visn["attention"]),
        "lang_mlp": jax.tree.map(
            lambda xl, sl: rows(xl, sl, L_l, "lang"),
            x["lang_mlp"], lang["mlp"]),
        "visn_mlp": jax.tree.map(
            lambda xl, sl: rows(xl, sl, L_v, "visn"),
            x["visn_mlp"], visn["mlp"]),
    }
    kind = jnp.asarray([KIND_LANG] * L_l + [KIND_VISN] * L_v
                       + [KIND_X] * L_x + [KIND_IDENT] * pad, jnp.int32)
    return {"slots": slots, "kind": kind,
            "layer_id": jnp.arange(L_pad, dtype=jnp.int32)}


# ---------------------------------------------------------------------------
# The virtual-layer body
# ---------------------------------------------------------------------------


def make_layer_apply(bert_cfg, dtype, n_lang: int, deterministic: bool,
                     remat: bool = False):
    """layer_apply(params_i, carry, extra) for gpipe_apply.

    carry = {"h": [b, Lt+Lv, H], "lang_bias": [b,1,1,Lt],
             ("visn_bias": [b,1,1,Lv])}; extra = base dropout key (or None).
    Wiring per kind mirrors the sequential encoder exactly
    (reference modeling.py:448-462 BertLayer, :469-528 LXRTXLayer).
    """
    from xggm_tpu.models.lxmert import CrossAttLayer, Mlp, SelfAttLayer

    # the Pallas kernels' custom_partitioning rules target the auto-sharded
    # jit boundary; inside this manual shard_map region the per-microbatch
    # shapes are tiny, so the plain XLA attention path is the right one
    import dataclasses

    cfg = (dataclasses.replace(bert_cfg, use_pallas_attention=False)
           if bert_cfg.use_pallas_attention else bert_cfg)
    sa = SelfAttLayer(cfg, dtype)
    ca = CrossAttLayer(cfg, dtype)
    mlp = Mlp(cfg, dtype)

    def layer_apply(pi, carry, base_key):
        s = pi["slots"]
        h = carry["h"]
        lang, visn = h[:, :n_lang], h[:, n_lang:]
        lang_bias = carry["lang_bias"]
        visn_bias = carry.get("visn_bias")

        if deterministic:
            def rng(_):
                return None
        else:
            key = jax.random.fold_in(base_key, pi["layer_id"])

            def rng(i):
                return {"dropout": jax.random.fold_in(key, i)}

        def apply_sa(p, xx, bias, i):
            return sa.apply({"params": p}, xx, bias, deterministic,
                            rngs=rng(i))

        def apply_mlp(p, xx, i):
            return mlp.apply({"params": p}, xx, deterministic, rngs=rng(i))

        def f_lang(hh):
            l2 = apply_sa(s["lang_self_att"], lang, lang_bias, 0)
            l2 = apply_mlp(s["lang_mlp"], l2, 1)
            return jnp.concatenate([l2, visn], axis=1)

        def f_visn(hh):
            v2 = apply_sa(s["visn_self_att"], visn, visn_bias, 2)
            v2 = apply_mlp(s["visn_mlp"], v2, 3)
            return jnp.concatenate([lang, v2], axis=1)

        def f_x(hh):
            # shared cross-attention both directions, both reading the
            # pre-update inputs (reference modeling.py:488-491)
            lx = ca.apply({"params": s["visual_attention"]}, lang, visn,
                          visn_bias, deterministic, rngs=rng(4))
            vx = ca.apply({"params": s["visual_attention"]}, visn, lang,
                          lang_bias, deterministic, rngs=rng(5))
            lx = apply_sa(s["lang_self_att"], lx, lang_bias, 6)
            vx = apply_sa(s["visn_self_att"], vx, visn_bias, 7)
            lx = apply_mlp(s["lang_mlp"], lx, 8)
            vx = apply_mlp(s["visn_mlp"], vx, 9)
            return jnp.concatenate([lx, vx], axis=1)

        def f_ident(hh):
            return hh

        h2 = jax.lax.switch(pi["kind"], [f_lang, f_visn, f_x, f_ident], h)
        out = dict(carry)
        out["h"] = h2
        return out

    if remat:
        # recompute this virtual layer's activations in the backward pass
        # (the pp analog of config.remat's per-layer jax.checkpoint)
        layer_apply = jax.checkpoint(layer_apply, prevent_cse=False)
    return layer_apply


def pipelined_lxr_stack(enc_params: Dict[str, Any], lang: Array,
                        visn: Array, lang_bias: Array,
                        visn_bias: Optional[Array], bert_cfg, dtype, *,
                        mesh: Mesh, axis: str = "pipe",
                        batch_axis: Optional[str] = None,
                        n_microbatches: int = 4,
                        deterministic: bool = True,
                        dropout_key: Optional[Array] = None,
                        remat: bool = False) -> Tuple[Array, Array]:
    """Run the full lang->visn->x encoder stack as a GPipe pipeline over
    `mesh` axis `axis`. Drop-in for the sequential stack (same math; see
    module docstring for the schedule)."""
    n_lang = lang.shape[1]
    S = mesh.shape[axis]
    stacked = build_superset_stack(enc_params, S)
    h = jnp.concatenate([lang, visn.astype(lang.dtype)], axis=1)
    carry = {"h": h, "lang_bias": lang_bias}
    if visn_bias is not None:
        carry["visn_bias"] = visn_bias
    layer_apply = make_layer_apply(bert_cfg, dtype, n_lang, deterministic,
                                   remat)
    if not deterministic and dropout_key is None:
        raise ValueError("training-mode pipelined stack needs a dropout key")
    out = gpipe_apply(layer_apply, stacked, carry, mesh, axis=axis,
                      n_microbatches=n_microbatches,
                      extra=dropout_key, batch_axis=batch_axis)
    h2 = out["h"]
    return h2[:, :n_lang], h2[:, n_lang:]
