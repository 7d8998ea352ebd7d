"""Remaining GGM lineage modules (SURVEY.md §2.4/§2.7 inventory closure).

Behavioral ports of:
* GinPlainEncoder / GCNPlainEncoder (reference
  graph_generative_modeling.py:15-58): n rounds of message passing over a
  fixed adjacency, no adjacency recompute.
* MixGenerator (reference graph_generative_modeling.py:272-323): VAE-style
  node generation from the pooled vector (fc mu/logvar -> decoder to
  36 x hidden) followed by GIN refinement; returns (nodes, vae_loss).
* Kipf-style spectral GCN over symmetrically-normalized adjacency with
  self-loops (reference model/gcn.py:9-38 + model/gcn_layer.py:10-50).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xggm_tpu.config import NUM_OBJECTS
from xggm_tpu.ggm.gnn import GIN, GCN

Array = jax.Array


class GinPlainEncoder(nn.Module):
    """(reference graph_generative_modeling.py:15-40)"""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.n_layers):
            x = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim),
                    n_layers=1, dropout=self.dropout, name=f"gnn_{i}")(
                x, adj, deterministic)
        return x


class GCNPlainEncoder(nn.Module):
    """(reference graph_generative_modeling.py:43-68)"""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.n_layers):
            x = GCN(hidden_dims=(self.hidden_dim, self.hidden_dim),
                    n_layers=1, dropout=self.dropout, name=f"gnn_{i}")(
                x, adj, deterministic)
        return x


class MixGenerator(nn.Module):
    """VAE node generator + GIN refinement (reference
    graph_generative_modeling.py:272-323)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adj: Array, obj_feats: Array, key: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        mu = nn.Dense(self.hidden_dim, name="fc1")(x)
        log_var = nn.Dense(self.hidden_dim, name="fc2")(x)
        std = jnp.exp(0.5 * log_var)
        eps = jax.random.normal(key, std.shape, std.dtype)
        z = mu + std * eps

        h = nn.Dense(6 * self.hidden_dim, name="dec1")(z)
        h = nn.relu(nn.LayerNorm(name="dec_ln")(h))
        nodes = nn.Dense(NUM_OBJECTS * self.hidden_dim, name="dec2")(h)
        nodes = nodes.reshape(-1, NUM_OBJECTS, self.hidden_dim)

        kl = -0.5 * jnp.sum(1.0 + log_var - mu ** 2 - jnp.exp(log_var))
        # BCE-with-logits against the (real) object features * 768
        # (reference quirk: obj feats are not probabilities)
        t = obj_feats.astype(jnp.float32)
        lg = nodes.astype(jnp.float32)
        rec = jnp.mean(jnp.maximum(lg, 0) - lg * t
                       + jnp.log1p(jnp.exp(-jnp.abs(lg)))) * 768.0

        out = nodes
        for i in range(self.n_layers):
            out = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim),
                      n_layers=1, dropout=self.dropout, name=f"gnn_{i}")(
                out, adj, deterministic)
        return out, rec + kl


class GraphConvolution(nn.Module):
    """Kipf GCN layer: adj @ (x W) + b, uniform(-1/sqrt(F_out)) init
    (reference model/gcn_layer.py:10-50)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, adj: Array) -> Array:
        stdv = 1.0 / jnp.sqrt(self.features)
        init = nn.initializers.uniform(scale=2 * stdv)

        def centered(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - stdv

        w = self.param("weight", centered, (x.shape[-1], self.features))
        support = jnp.einsum("bnf,fo->bno", x, w,
                             preferred_element_type=jnp.float32)
        out = jnp.einsum("bij,bjo->bio", adj, support,
                         preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", centered, (self.features,))
            out = out + b
        return out


def normalize_adjacency(adjs: Array, node_flags: Array) -> Array:
    """Self-loops + symmetric D^-1/2 A D^-1/2 normalization (reference
    model/gcn.py:_graph_preprocess, :31-38)."""
    n = adjs.shape[-1]
    eye = jnp.eye(n, dtype=adjs.dtype)
    adjs = jnp.where(adjs.sum((-1, -2), keepdims=True) > 0, adjs, adjs) \
        * (1.0 - eye) + eye  # ensure self-loops
    d = adjs.sum(-1)
    dh = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    return dh[..., :, None] * adjs * dh[..., None, :]


class SpectralGCN(nn.Module):
    """Multi-layer Kipf GCN with normalized adjacency and inter-layer ReLU
    (reference model/gcn.py:9-38)."""

    feature_nums: Sequence[int]
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adjs: Array, node_flags: Array) -> Array:
        adj_hat = normalize_adjacency(adjs, node_flags)
        x = x * node_flags[..., None]
        n_layers = len(self.feature_nums) - 1
        for i in range(n_layers):
            x = GraphConvolution(self.feature_nums[i + 1],
                                 name=f"gcn_{i}")(x, adj_hat)
            if i < n_layers - 1:
                x = nn.relu(x)
        return x


def doubly_stochastic_norm(adjs_f: Array, do_row_norm: bool = True) -> Array:
    """Sinkhorn-style doubly-stochastic attention normalization (reference
    GSM lineage, model/gin.py:11-27): row-normalize, column-normalize, then
    E = E_tilde_colnorm @ E_tilde^T."""
    if do_row_norm:
        e_tilde = adjs_f / adjs_f.sum(axis=2, keepdims=True)
    else:
        e_tilde = adjs_f
    e_col = e_tilde / e_tilde.sum(axis=1, keepdims=True)
    return jnp.einsum("bij,bkj->bik", e_col, e_tilde)


class GraphAttentionLayer(nn.Module):
    """GSM-lineage GAT layer (reference model/gin.py:29-88): additive
    attention over [h_i, h_j, adj_ij] triples, attention multiplied by the
    adjacency (not masked-filled like the live GAT), ELU when concat.

    NOTE: the reference's companion GIN/GINPlain energy networks
    (model/gin.py:235-545) carry latent shape mismatches in their
    `h + eps * cat([x, x])` aggregation (MLP input dims don't line up for
    the constructor's feature_nums) and are unreachable dead code; the
    working member of that family is the multi-channel GIN inside the
    EDP-GNN score network (ggm/score_network.MultiChannelGIN)."""

    out_features: int
    alpha: float = 0.2
    concat: bool = True

    @nn.compact
    def __call__(self, x: Array, adj: Array) -> Array:
        # xavier-uniform gain 1.414, as the reference initializes
        init = nn.initializers.variance_scaling(
            1.414 ** 2, "fan_avg", "uniform")
        w = self.param("W", init, (x.shape[-1], self.out_features))
        a = self.param("a", init, (2 * self.out_features + 1, 1))
        h = x @ w                                       # [B, N, F_out]
        n = h.shape[1]
        h_b = jnp.broadcast_to(h[:, :, None, :],
                               (h.shape[0], n, n, h.shape[-1]))
        h_bt = jnp.swapaxes(h_b, 1, 2)
        a_in = jnp.concatenate([h_b, h_bt, adj[..., None]], axis=-1)
        e = nn.leaky_relu((a_in @ a)[..., 0], negative_slope=self.alpha)
        attention = jax.nn.softmax(e, axis=-1) * adj
        h_prime = attention @ h
        return nn.elu(h_prime) if self.concat else h_prime
