"""Task models: LXMERT encoder + answer head + GGM parts.

Behavioral spec from reference src/gqa/gqa_ood_model.py:52-122 and
src/vqa/vqacpv2_model.py:52-131 (structurally identical):

  - lxrt_encoder (mode 'lxr'): returns ((lang_seq, visn_seq), input_mask, pooled)
  - logit_fc: hid -> 2*hid -> GeLU -> LN(1e-12) -> num_answers
  - generator: GCN/GIN/GAT generator switch
  - encoder_adj: Linear(768 -> 630) + sigmoid   (pooled -> triu adjacency)
  - node_fc: Linear(hid -> hid) + GeLU + LN(1e-5)
  - fusion_fc: Linear(2*hid -> hid) + GeLU + LN(1e-5)

The PlainModel mirrors GQAPlainModel/VQAPlainModel (gqa_ood_model.py:20-49):
encoder pooled output -> answer head only.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xggm_tpu.config import LxmertConfig, GGMConfig, NUM_OBJECTS, NUM_TRIU_EDGES
from xggm_tpu.ggm.gnn import TorchLayerNorm
from xggm_tpu.ggm.generators import make_generator
from xggm_tpu.models.lxmert import (
    LxmertModel, AnswerHead, gelu, dense,
)
from xggm_tpu.ops.basic import torch_dense

Array = jax.Array

# Row-major strict-upper-triangular index pairs of the 36x36 adjacency -
# the order torch's `adj[ones.triu(1) == 1] = vals` fills (reference
# src/gqa/gqa_ood.py:181-186).
_TRIU_I, _TRIU_J = np.triu_indices(NUM_OBJECTS, k=1)


def triu_to_adjacency(vals: Array) -> Array:
    """[B, 630] upper-triangular values -> symmetric [B, 36, 36] with zero
    diagonal (reference gqa_ood.py:181-187)."""
    b = vals.shape[0]
    adj = jnp.zeros((b, NUM_OBJECTS, NUM_OBJECTS), vals.dtype)
    adj = adj.at[:, _TRIU_I, _TRIU_J].set(vals)
    return adj + jnp.swapaxes(adj, -1, -2)


def adjacency_to_triu(adj: Array) -> Array:
    """Inverse gather: [B, 36, 36] -> [B, 630] row-major strict-upper entries."""
    return adj[:, _TRIU_I, _TRIU_J]


class NodeFC(nn.Module):
    """Linear -> GeLU -> LN(1e-5) (reference gqa_ood_model.py:88-92)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch-default init (reference node_fc/fusion_fc are plain
        # nn.Linear, gqa_ood_model.py:88-92,108-112)
        x = torch_dense(self.features, self.dtype, name="fc")(x)
        return TorchLayerNorm(name="ln")(gelu(x))


class XGGMModel(nn.Module):
    """Full X-GGM task model (GQAModel/VQAModel equivalent)."""

    cfg: LxmertConfig
    ggm: GGMConfig
    num_answers: int

    def setup(self):
        dt = self.cfg.compute_dtype
        hid = self.cfg.bert.hidden_size
        self.encoder = LxmertModel(self.cfg, name="lxrt")
        self.logit_fc = AnswerHead(hid, self.num_answers, dt, name="logit_fc")
        self.generator = make_generator(
            self.ggm.gnn, hid, self.ggm.num_layers, self.ggm.dropout, dt,
            self.ggm.gat_heads)
        self.encoder_adj_fc = torch_dense(NUM_TRIU_EDGES, dt,
                                  name="encoder_adj")
        self.node_fc = NodeFC(hid, dt, name="node_fc")
        self.fusion_fc = NodeFC(hid, dt, name="fusion_fc")

    def __call__(self, input_ids: Array, input_mask: Array,
                 token_type_ids: Array, feats: Array, boxes: Array,
                 deterministic: bool = True):
        """Encoder pass (reference GQAModel.forward, gqa_ood_model.py:114-122):
        returns ((lang_seq, visn_seq), input_mask, pooled)."""
        feat_seq, pooled = self.encoder(
            input_ids, input_mask, token_type_ids, feats, boxes,
            deterministic=deterministic)
        return feat_seq, input_mask, pooled

    def answer_logits(self, pooled: Array) -> Array:
        return self.logit_fc(pooled)

    def encode_adjacency(self, pooled: Array) -> Array:
        """pooled [B, hid] -> symmetric sigmoid adjacency [B, 36, 36]
        (reference gqa_ood_model.py:83-86 + gqa_ood.py:181-187)."""
        vals = jax.nn.sigmoid(self.encoder_adj_fc(pooled).astype(jnp.float32))
        return triu_to_adjacency(vals)

    def node_features_from_pooled(self, pooled: Array) -> Array:
        """pooled -> 36 replicated node features through node_fc (reference
        gqa_ood.py:235-236)."""
        tiled = jnp.repeat(pooled[:, None, :], NUM_OBJECTS, axis=1)
        return self.node_fc(tiled)

    def fuse(self, pooled: Array, node_feats: Array) -> Array:
        """x_gen = fusion_fc([x, tanh(mean_nodes)]) (reference gqa_ood.py:201-204)."""
        summary = jnp.tanh(jnp.mean(node_feats, axis=1))
        return self.fusion_fc(jnp.concatenate(
            [pooled, summary.astype(pooled.dtype)], axis=-1))

    def generate(self, node_feats: Array, adj: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        return self.generator(node_feats, adj, deterministic)

    # ------------------------------------------------------------------
    # Composite branch forwards - each is ONE linen method so a train step
    # is a single model.apply call (one traced graph for XLA to fuse).
    # ------------------------------------------------------------------

    def init_all(self, input_ids, input_mask, token_type_ids, feats, boxes,
                 adj_true, noise_key):
        """Touch every submodule once so `model.init(..., method='init_all')`
        creates the full parameter tree (setup-defined linen modules only
        materialize params for submodules actually called)."""
        logits, adj_gen, _, _ = self.relation_branch(
            input_ids, input_mask, token_type_ids, feats, boxes, adj_true,
            noise_key, deterministic=True)
        _ = self.node_features_from_pooled(
            jnp.zeros((input_ids.shape[0], self.cfg.bert.hidden_size),
                      self.cfg.compute_dtype))
        return logits

    def clean_forward(self, input_ids, input_mask, token_type_ids, feats,
                      boxes, deterministic: bool = False):
        """Plain VQA phase (reference gqa_ood.py:282-289): encoder -> logits."""
        _, _, pooled = self(input_ids, input_mask, token_type_ids, feats,
                            boxes, deterministic=deterministic)
        return self.logit_fc(pooled)

    def relation_branch(self, input_ids, input_mask, token_type_ids, feats,
                        boxes, adj_true, noise_key,
                        deterministic: bool = False, noise_override=None):
        """Relation-generation branch (reference gqa_ood.py:180-231).

        Returns (logits, adj_gen, grad_log_noise, adj_true_nodiag) for the
        loss combination done in the train step.

        noise_override: optional pre-drawn symmetric noise tensor replacing
        the key-drawn Gaussian - used by trajectory-parity tests to replay
        the exact noise the reference loop drew.
        """
        from xggm_tpu.ops.noise import (
            add_edge_noise, apply_known_noise, remove_self_loops)

        feat_seq, _, pooled = self(input_ids, input_mask, token_type_ids,
                                   feats, boxes, deterministic=deterministic)
        visn = feat_seq[1]
        adj_true_nd = remove_self_loops(adj_true.astype(jnp.float32))
        adj_noise = self.encode_adjacency(pooled)
        if noise_override is not None:
            adj_noise, grad_log_noise = apply_known_noise(
                adj_noise, noise_override, self.ggm.sigma)
        else:
            adj_noise, grad_log_noise = add_edge_noise(
                noise_key, adj_noise, self.ggm.sigma)
        node_feats, adj_gen = self.generate(
            node_feats=visn, adj=adj_noise.astype(visn.dtype),
            deterministic=deterministic)
        x_gen = self.fuse(pooled, node_feats)
        logits = self.logit_fc(x_gen)
        return logits, adj_gen.astype(jnp.float32), grad_log_noise, adj_true_nd

    def representation_branch(self, input_ids, input_mask, token_type_ids,
                              feats, boxes, adj_true, noise_key,
                              deterministic: bool = False,
                              noise_override=None):
        """Representation-generation branch (reference gqa_ood.py:232-280).

        Returns (logits, node_feats_gen, feat_grad, visn_feats).
        """
        from xggm_tpu.ops.noise import (
            add_feature_noise, apply_known_noise, remove_self_loops)

        feat_seq, _, pooled = self(input_ids, input_mask, token_type_ids,
                                   feats, boxes, deterministic=deterministic)
        visn = feat_seq[1]
        adj_true_nd = remove_self_loops(adj_true.astype(jnp.float32))
        node_feats = self.node_features_from_pooled(pooled)
        if noise_override is not None:
            node_feats, feat_grad = apply_known_noise(
                node_feats.astype(jnp.float32), noise_override,
                self.ggm.sigma)
        else:
            node_feats, feat_grad = add_feature_noise(
                noise_key, node_feats.astype(jnp.float32), self.ggm.sigma)
        node_feats, _ = self.generate(
            node_feats=node_feats.astype(visn.dtype),
            adj=adj_true_nd.astype(visn.dtype),
            deterministic=deterministic)
        x_gen = self.fuse(pooled, node_feats)
        logits = self.logit_fc(x_gen)
        return logits, node_feats.astype(jnp.float32), feat_grad, \
            visn.astype(jnp.float32)


class PlainModel(nn.Module):
    """Encoder + answer head baseline (reference GQAPlainModel,
    gqa_ood_model.py:20-49; trained by src/vqa/vqacpv2_baseline.py)."""

    cfg: LxmertConfig
    num_answers: int

    @nn.compact
    def __call__(self, input_ids: Array, input_mask: Array,
                 token_type_ids: Array, feats: Array, boxes: Array,
                 deterministic: bool = True) -> Array:
        _, pooled = LxmertModel(self.cfg, name="lxrt")(
            input_ids, input_mask, token_type_ids, feats, boxes,
            deterministic=deterministic)
        return AnswerHead(self.cfg.bert.hidden_size, self.num_answers,
                          self.cfg.compute_dtype, name="logit_fc")(pooled)
