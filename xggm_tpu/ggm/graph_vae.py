"""Graph VAE + edge-refinement GNN lineage modules.

Behavioral port of reference src/module/graph_vae.py:11-109 (GIN-encoder
GraphVAE over the 36-node adjacency) and src/module/edge_gnn.py:72-114
(EdgeGNN with per-layer pairwise edge re-estimation). Research lineage
(SURVEY.md §2.7), functional-RNG and fully batched.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xggm_tpu.config import NUM_OBJECTS, NUM_TRIU_EDGES
from xggm_tpu.ggm.gnn import GIN
from xggm_tpu.ops.noise import node_feature_to_matrix

Array = jax.Array

_TRIU_I, _TRIU_J = np.triu_indices(NUM_OBJECTS, k=1)


class MLPDecoder(nn.Module):
    """Linear-LN-ReLU-Linear decoder with relu-gain xavier init (reference
    graph_vae.py:11-27). Output dim = hidden_dim // 2."""

    hidden_dim: int = 16
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        init = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_dim, kernel_init=init)(x)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        return nn.Dense(self.hidden_dim // 2, kernel_init=init)(x)


def recover_adj(l: Array) -> Array:
    """[B, 630] strict-upper values -> symmetric [B, 36, 36] (reference
    graph_vae.py:80-89)."""
    b = l.shape[0]
    adj = jnp.zeros((b, NUM_OBJECTS, NUM_OBJECTS), l.dtype)
    adj = adj.at[:, _TRIU_I, _TRIU_J].set(l)
    return adj + jnp.swapaxes(adj, -1, -2)


class GraphVAE(nn.Module):
    """GIN-encoder VAE over adjacency (reference graph_vae.py:30-109):
    two GIN encoders -> normalized max-pool -> reparameterized z ->
    MLP decoder of the 630 upper-triangular logits; losses: KL/1296 +
    BCE-with-logits against the true triu entries."""

    hidden_dim: int = 300
    input_dim: int = 768

    def setup(self):
        self.encoder_mu = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim),
                              n_layers=2, name="encoder_mu")
        self.encoder_var = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim),
                               n_layers=2, name="encoder_var")
        self.decoder = MLPDecoder(hidden_dim=2 * NUM_TRIU_EDGES,
                                  name="decoder")

    def __call__(self, x: Array, adj: Array, key: Array,
                 deterministic: bool = True
                 ) -> Tuple[Array, Array, Array]:
        mu = self.encoder_mu(x, adj, deterministic)
        log_var = self.encoder_var(x, adj, deterministic)

        def norm_maxpool(v):
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                                1e-12)
            return jnp.max(v, axis=1)

        mu = norm_maxpool(mu)
        log_var = norm_maxpool(log_var)

        if deterministic:
            z = mu
        else:
            # reference re_parameterize uses std = exp(log_var) (not half)
            eps = jax.random.normal(key, log_var.shape, log_var.dtype)
            z = eps * jnp.exp(log_var) + mu

        logits = self.decoder(z, deterministic)  # [B, 630]
        rec_adj = recover_adj(jax.nn.sigmoid(logits))

        kl_loss = -0.5 * jnp.sum(1.0 + log_var - mu ** 2 - jnp.exp(log_var))
        kl_loss = kl_loss / (NUM_OBJECTS * NUM_OBJECTS)

        z_true = adj[:, _TRIU_I, _TRIU_J]
        x_ = logits.astype(jnp.float32)
        t_ = z_true.astype(jnp.float32)
        rec_loss = jnp.mean(jnp.maximum(x_, 0) - x_ * t_
                            + jnp.log1p(jnp.exp(-jnp.abs(x_))))
        return rec_adj, kl_loss, rec_loss


class EdgeGNN(nn.Module):
    """GIN rounds with pairwise-MLP edge re-estimation and summed
    jumping-knowledge over both node and adjacency streams (reference
    edge_gnn.py:72-111)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        hidden_x = [x]
        hidden_adj = [adj]
        for i in range(self.n_layers):
            x = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim),
                    n_layers=2, dropout=self.dropout, name=f"gnn_{i}")(
                x, adj, deterministic)
            hidden_x.append(x)
            pair = node_feature_to_matrix(x)  # [B, N, N, 2H]
            adj = nn.Dense(1, name=f"edge_{i}")(pair)[..., 0]
            hidden_adj.append(adj)
        x = sum(hidden_x)
        adj = sum(hidden_adj)
        return x, adj
