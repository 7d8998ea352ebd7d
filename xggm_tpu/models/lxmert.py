"""LXMERT cross-modal encoder, TPU-first.

Behavioral spec from reference src/lxrt/modeling.py (BERT-base blocks
:278-465, LXMERT extensions :469-607, heads :608-713, tops :894-1093) -
re-architected for XLA/TPU:

* One fused QKV projection per attention block (single MXU matmul instead of
  three), split after the projection. Head layout kept [B, H, L, D].
* Additive -10000 mask convention (modeling.py:919-928), erf-GeLU
  (modeling.py:116-124), LayerNorm eps 1e-12 - all preserved exactly for
  checkpoint parity.
* The x-layer's cross-attention weights are SHARED between the lang->visn and
  visn->lang directions (modeling.py:488-491).
* Params stay float32; matmul inputs are cast to `cfg.dtype` (bfloat16 on TPU
  rides the MXU at 2x rate); LayerNorm and softmax run in float32.
* Sequences are tiny and static (20 text + 36 objects), so XLA sees fully
  static shapes and fuses the elementwise chains into the matmuls; an optional
  Pallas fused-attention kernel covers the hot path (ops/pallas_attention.py).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xggm_tpu.config import BertConfig, LxmertConfig

from xggm_tpu.ops.basic import gelu, dense, bert_normal_init, LayerNormBase

Array = jax.Array

NEG_INF_MASK = -10000.0  # reference modeling.py:928


LayerNorm = LayerNormBase  # eps 1e-12 default (BertLayerNorm semantics)




def additive_mask(mask: Array, dtype=jnp.float32) -> Array:
    """[B, L] {0,1} -> [B, 1, 1, L] additive bias in {0, -10000}
    (reference modeling.py:919-928)."""
    m = mask.astype(jnp.float32)
    return ((1.0 - m) * NEG_INF_MASK)[:, None, None, :].astype(dtype)


class BertEmbeddings(nn.Module):
    """Word + position + type embeddings (reference modeling.py:278-314)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, token_type_ids: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word_emb = nn.Embed(c.vocab_size, c.hidden_size,
                            embedding_init=bert_normal_init(c.initializer_range),
                            param_dtype=jnp.float32, name="word_embeddings")
        pos_emb = nn.Embed(c.max_position_embeddings, c.hidden_size,
                           embedding_init=bert_normal_init(c.initializer_range),
                           param_dtype=jnp.float32, name="position_embeddings")
        type_emb = nn.Embed(c.type_vocab_size, c.hidden_size,
                            embedding_init=bert_normal_init(c.initializer_range),
                            param_dtype=jnp.float32, name="token_type_embeddings")
        seq_len = input_ids.shape[1]
        position_ids = jnp.broadcast_to(
            jnp.arange(seq_len, dtype=jnp.int32)[None, :], input_ids.shape)

        def lookup(emb, ids):
            # padding_idx=0 semantics (reference modeling.py:284-290): torch
            # zeroes the gradient flowing into row 0 of each table. With
            # all-zero token_type_ids the type table never trains, and the
            # position-0 ([CLS]) row is frozen - preserved for trajectory
            # parity with the reference.
            out = emb(ids)
            return jnp.where((ids != 0)[..., None], out,
                             jax.lax.stop_gradient(out))

        x = lookup(word_emb, input_ids) + lookup(pos_emb, position_ids) \
            + lookup(type_emb, token_type_ids)
        x = LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(self.dtype)


class Attention(nn.Module):
    """Multi-head attention core (reference BertAttention, modeling.py:316-375).

    Self-attention fuses Q,K,V into one projection; cross-attention fuses K,V.
    Softmax in float32; matmuls in `dtype`.
    """

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, context: Array,
                 attn_bias: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        c = self.cfg
        h, d = c.num_attention_heads, c.head_dim
        B, Lq, _ = hidden.shape
        Lk = context.shape[1]
        is_self = hidden is context

        if is_self:
            qkv = dense(3 * c.hidden_size, self.dtype, name="qkv",
                        stddev=c.initializer_range)(hidden)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(c.hidden_size, self.dtype, name="query",
                      stddev=c.initializer_range)(hidden)
            kv = dense(2 * c.hidden_size, self.dtype, name="kv",
                       stddev=c.initializer_range)(context)
            k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, h, d).transpose(0, 2, 1, 3)

        if c.use_pallas_attention:
            # Non-TPU backends run the kernels in interpret mode (CPU tests);
            # multi-device meshes partition them over the leading batch axis
            # via the kernels' custom_partitioning rules.
            # The flattened [B*H, L, D] kernels beat the layout-preserving
            # BLHD variants (ops/pallas_attention.py) by ~21% full-step:
            # the H<->L transpose copies here (~10 ms/step) are cheaper than
            # the BLHD kernels' strided per-head VMEM loads + stack
            # relayouts (113 vs 94 ms/step measured, tools/perf_probe.py).
            rate = c.attention_probs_dropout_prob
            if deterministic or rate == 0:
                from xggm_tpu.ops.pallas_attention import mha_pallas

                ctx = mha_pallas(q, k, v, attn_bias)
            else:
                from xggm_tpu.ops.pallas_attention import mha_pallas_dropout

                seed = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32).astype(jnp.int32)
                ctx = mha_pallas_dropout(q, k, v, attn_bias, seed, rate)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, c.hidden_size)
            return ctx.astype(self.dtype)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d))
        if attn_bias is not None:
            scores = scores + attn_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, c.hidden_size)
        return ctx.astype(self.dtype)


class AttOutput(nn.Module):
    """Projection + dropout + residual LayerNorm (reference modeling.py:377-389)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, residual: Array,
                 deterministic: bool = True) -> Array:
        c = self.cfg
        x = dense(c.hidden_size, self.dtype, name="dense",
                  stddev=c.initializer_range)(hidden)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x + residual)


class SelfAttLayer(nn.Module):
    """Self-attention block (reference BertSelfattLayer, modeling.py:403-415)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Optional[Array],
                 deterministic: bool = True) -> Array:
        out = Attention(self.cfg, self.dtype, name="self")(
            x, x, attn_bias, deterministic)
        return AttOutput(self.cfg, self.dtype, name="output")(
            out, x, deterministic)


class CrossAttLayer(nn.Module):
    """Cross-attention block (reference BertCrossattLayer, modeling.py:391-401)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, ctx: Array, ctx_bias: Optional[Array],
                 deterministic: bool = True) -> Array:
        out = Attention(self.cfg, self.dtype, name="att")(
            x, ctx, ctx_bias, deterministic)
        return AttOutput(self.cfg, self.dtype, name="output")(
            out, x, deterministic)


class Mlp(nn.Module):
    """Intermediate + output FFN (reference modeling.py:417-446)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        c = self.cfg
        h = dense(c.intermediate_size, self.dtype, name="intermediate",
                  stddev=c.initializer_range)(x)
        h = gelu(h)
        h = dense(c.hidden_size, self.dtype, name="output",
                  stddev=c.initializer_range)(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x + h)


class BertLayer(nn.Module):
    """Standard transformer encoder layer (reference modeling.py:448-462)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Optional[Array],
                 deterministic: bool = True) -> Array:
        x = SelfAttLayer(self.cfg, self.dtype, name="attention")(
            x, attn_bias, deterministic)
        return Mlp(self.cfg, self.dtype, name="mlp")(x, deterministic)


class XLayer(nn.Module):
    """Cross-modality layer (reference LXRTXLayer, modeling.py:469-528).

    The cross-attention submodule is instantiated ONCE and applied in both
    directions with shared weights, both reading the pre-update inputs
    (reference modeling.py:488-491).
    """

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang: Array, lang_bias: Optional[Array],
                 visn: Array, visn_bias: Optional[Array],
                 deterministic: bool = True) -> Tuple[Array, Array]:
        cross = CrossAttLayer(self.cfg, self.dtype, name="visual_attention")
        lang_x = cross(lang, visn, visn_bias, deterministic)
        visn_x = cross(visn, lang, lang_bias, deterministic)

        lang_x = SelfAttLayer(self.cfg, self.dtype, name="lang_self_att")(
            lang_x, lang_bias, deterministic)
        visn_x = SelfAttLayer(self.cfg, self.dtype, name="visn_self_att")(
            visn_x, visn_bias, deterministic)

        lang_x = Mlp(self.cfg, self.dtype, name="lang_mlp")(lang_x, deterministic)
        visn_x = Mlp(self.cfg, self.dtype, name="visn_mlp")(visn_x, deterministic)
        return lang_x, visn_x


class _BertStackBody(nn.Module):
    """nn.scan body: one BertLayer reading a [L, ...]-stacked param slice.

    Carry = hidden states; the attention bias broadcasts (in_axes=
    nn.broadcast). `det` is a static module attribute, so the scanned graph
    contains no traced control flow.
    """

    cfg: BertConfig
    dtype: Any
    det: bool

    @nn.compact
    def __call__(self, x: Array, attn_bias: Optional[Array]):
        x = BertLayer(self.cfg, self.dtype, name="layer")(
            x, attn_bias, self.det)
        return x, None


class _XStackBody(nn.Module):
    """nn.scan body for the cross-modality stack: carry = (lang, visn)."""

    cfg: BertConfig
    dtype: Any
    det: bool

    @nn.compact
    def __call__(self, carry, biases):
        lang, visn = carry
        lang_bias, visn_bias = biases
        lang, visn = XLayer(self.cfg, self.dtype, name="layer")(
            lang, lang_bias, visn, visn_bias, self.det)
        return (lang, visn), None


def _layer_stack(body_cls, cfg: BertConfig, dtype, det: bool, length: int,
                 name: str, remat: bool = False):
    """Scan over `length` stacked layers: params get a leading [L] axis
    (variable_axes), per-layer dropout keys are split from one stream
    (split_rngs), and the attention biases broadcast unscanned.

    unroll=length: the param layout stays stacked (big optimizer leaves,
    stacked gradients out of the VJP) but the COMPUTE unrolls into one
    straight-line graph - measured on v5e, a rolled while-loop costs
    +41 ms/step (131 vs 90 ms) because weight prefetch cannot cross the
    loop barrier, while full unroll keeps XLA's cross-layer scheduling and
    turns the per-iteration dynamic slices into free static slices."""
    if remat:
        # prevent_cse=False: inside scan the loop boundary already blocks
        # the CSE that prevent_cse guards against (jax.checkpoint docs)
        body_cls = nn.remat(body_cls, prevent_cse=False)
    scan = nn.scan(body_cls,
                   variable_axes={"params": 0},
                   split_rngs={"params": True, "dropout": True},
                   in_axes=nn.broadcast,
                   length=length,
                   unroll=length)
    return scan(cfg, dtype, det, name=name)


class VisualFeatEncoder(nn.Module):
    """Object feature + box position embedding (reference modeling.py:530-557):
    output = dropout((LN(W_f feats) + LN(W_b boxes)) / 2)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, feats: Array, boxes: Array,
                 deterministic: bool = True) -> Array:
        c = self.cfg.bert
        dt = self.cfg.compute_dtype
        x = dense(c.hidden_size, dt, name="visn_fc",
                  stddev=c.initializer_range)(feats.astype(dt))
        x = LayerNorm(epsilon=c.layer_norm_eps, name="visn_layer_norm")(x)
        y = dense(c.hidden_size, dt, name="box_fc",
                  stddev=c.initializer_range)(boxes.astype(dt))
        y = LayerNorm(epsilon=c.layer_norm_eps, name="box_layer_norm")(y)
        out = (x + y) * 0.5
        return nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)


class Pooler(nn.Module):
    """CLS tanh pooler (reference modeling.py:608-620)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        x = dense(self.cfg.hidden_size, self.dtype, name="dense",
                  stddev=self.cfg.initializer_range)(hidden[:, 0])
        return jnp.tanh(x)


class LxmertEncoder(nn.Module):
    """L/R/X layer stack (reference LXRTEncoder, modeling.py:559-606):
    visual embedding -> N_l language layers -> N_r relational (visual) layers
    -> N_x cross-modality layers."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, lang: Array, lang_bias: Optional[Array],
                 feats: Array, boxes: Array,
                 visn_bias: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        c, v = self.cfg.bert, self.cfg.visual
        dt = self.cfg.compute_dtype

        visn = VisualFeatEncoder(self.cfg, name="visn_fc")(
            feats, boxes, deterministic)

        if self.cfg.pp_stages > 1 and not self.cfg.stacked_layers:
            raise ValueError("pp_stages > 1 requires stacked_layers=True "
                             "(the [L, ...] param layout the pipeline's "
                             "superset stack is built from)")
        if self.cfg.pp_stages > 1 and not self.is_initializing():
            # GPipe over the heterogeneous lang->visn->x sequence
            # (parallel/pipeline_lxmert.py). Init still runs the stacked
            # path below - it creates the identical param tree, so
            # checkpoints interchange between pp and non-pp configs.
            from xggm_tpu.parallel.pipeline_lxmert import (
                get_pipeline_context, pipelined_lxr_stack)

            ctx = get_pipeline_context()
            S = ctx["mesh"].shape[ctx["axis"]]
            if S != self.cfg.pp_stages:
                raise ValueError(
                    f"config.pp_stages={self.cfg.pp_stages} but the "
                    f"pipeline mesh's '{ctx['axis']}' axis has {S} devices")
            key = None if deterministic else self.make_rng("dropout")
            return pipelined_lxr_stack(
                self.variables["params"], lang, visn, lang_bias, visn_bias,
                c, dt, mesh=ctx["mesh"], axis=ctx["axis"],
                batch_axis=ctx["batch_axis"],
                n_microbatches=ctx["n_microbatches"],
                deterministic=deterministic, dropout_key=key,
                remat=self.cfg.remat)

        if self.cfg.stacked_layers:
            # scan-over-layers (opt-in; see config.stacked_layers): each
            # stack's params are single [L, ...] leaves - the optimizer
            # update runs one fused loop per stacked leaf instead of
            # hundreds of per-layer launches, and the VJP's scan emits
            # gradients already stacked.
            rm = self.cfg.remat
            lang, _ = _layer_stack(_BertStackBody, c, dt, deterministic,
                                   v.l_layers, "lang_stack", rm)(
                lang, lang_bias)
            visn, _ = _layer_stack(_BertStackBody, c, dt, deterministic,
                                   v.r_layers, "r_stack", rm)(visn, visn_bias)
            (lang, visn), _ = _layer_stack(
                _XStackBody, c, dt, deterministic, v.x_layers, "x_stack",
                rm)((lang, visn), (lang_bias, visn_bias))
            return lang, visn

        Layer, XL = BertLayer, XLayer
        if self.cfg.remat:
            # per-layer jax.checkpoint: the bwd recomputes each layer's
            # activations from its input (config.remat). `deterministic` is
            # a static call arg (flax counts the module scope as arg 0).
            Layer = nn.remat(BertLayer, static_argnums=(3,))
            XL = nn.remat(XLayer, static_argnums=(5,))
        for i in range(v.l_layers):
            lang = Layer(c, dt, name=f"layer_{i}")(
                lang, lang_bias, deterministic)
        for i in range(v.r_layers):
            visn = Layer(c, dt, name=f"r_layer_{i}")(
                visn, visn_bias, deterministic)
        for i in range(v.x_layers):
            lang, visn = XL(c, dt, name=f"x_layer_{i}")(
                lang, lang_bias, visn, visn_bias, deterministic)
        return lang, visn


class LxmertModel(nn.Module):
    """Full encoder: embeddings + L/R/X stack + pooler (reference LXRTModel,
    modeling.py:894-952). Returns ((lang_seq, visn_seq), pooled_cls)."""

    cfg: LxmertConfig

    @nn.compact
    def __call__(self, input_ids: Array, input_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 feats: Array = None, boxes: Array = None,
                 visn_mask: Optional[Array] = None,
                 deterministic: bool = True):
        c = self.cfg.bert
        dt = self.cfg.compute_dtype
        if input_mask is None:
            input_mask = jnp.ones_like(input_ids)
        lang_bias = additive_mask(input_mask)
        visn_bias = additive_mask(visn_mask) if visn_mask is not None else None

        emb = BertEmbeddings(c, dt, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        lang, visn = LxmertEncoder(self.cfg, name="encoder")(
            emb, lang_bias, feats, boxes, visn_bias, deterministic)
        pooled = Pooler(c, dt, name="pooler")(lang)
        return (lang, visn), pooled


class BertTextModel(nn.Module):
    """Plain text-only BERT encoder (embeddings + N layers + pooler).

    Used by the data-factory adjacency precompute (the reference embeds
    object/attribute class names with HF bert-base-uncased pooled outputs,
    data/preprocess/gqa/compute_adjacency_train.py:19-24) and usable with
    bert-base-uncased torch checkpoints via the weight bridge."""

    cfg: BertConfig
    num_layers: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, input_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 deterministic: bool = True):
        if input_mask is None:
            input_mask = jnp.ones_like(input_ids)
        bias = additive_mask(input_mask)
        x = BertEmbeddings(self.cfg, self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        for i in range(self.num_layers):
            x = BertLayer(self.cfg, self.dtype, name=f"layer_{i}")(
                x, bias, deterministic)
        pooled = Pooler(self.cfg, self.dtype, name="pooler")(x)
        return x, pooled


class AnswerHead(nn.Module):
    """VQA answer MLP: hid -> 2*hid -> GeLU -> LN -> num_answers
    (reference BertVisualAnswerHead modeling.py:662-675 and the task models'
    logit_fc, src/gqa/gqa_ood_model.py:63-69)."""

    hidden_size: int
    num_answers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = dense(2 * self.hidden_size, self.dtype, name="fc1")(x)
        h = gelu(h)
        h = LayerNorm(name="ln")(h)
        logits = dense(self.num_answers, self.dtype, name="fc2")(h)
        return logits.astype(jnp.float32)


class PredictionHeadTransform(nn.Module):
    """dense + GeLU + LN (reference modeling.py:622-640)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = dense(self.cfg.hidden_size, self.dtype, name="dense",
                  stddev=self.cfg.initializer_range)(x)
        x = gelu(x)
        return LayerNorm(epsilon=self.cfg.layer_norm_eps, name="LayerNorm")(x)


class LMPredictionHead(nn.Module):
    """Masked-LM head with the decoder tied to the word-embedding matrix
    (reference BertLMPredictionHead, modeling.py:642-660). The tied embedding
    table is passed in at call time."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, word_embedding: Array) -> Array:
        x = PredictionHeadTransform(self.cfg, self.dtype, name="transform")(x)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.cfg.vocab_size,), jnp.float32)
        logits = jnp.einsum("bld,vd->blv", x, word_embedding.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32) + bias


class VisualObjHead(nn.Module):
    """Per-visual-loss decoders over a shared transform
    (reference BertVisualObjHead, modeling.py:677-701)."""

    cfg: BertConfig
    visual_losses: Tuple[str, ...] = ("obj", "attr", "feat")
    loss_dims: Tuple[int, ...] = (1600, 400, 2048)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        x = PredictionHeadTransform(self.cfg, self.dtype, name="transform")(x)
        return {
            key: dense(dim, self.dtype, name=f"decoder_{key}")(x).astype(jnp.float32)
            for key, dim in zip(self.visual_losses, self.loss_dims)
        }
