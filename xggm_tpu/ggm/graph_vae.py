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


class MlpVaePlain(nn.Module):
    """Plain MLP VAE (reference model/graph_vae.py MLP_VAE_plain, :24-56):
    Linear mu/lsgms encoders, relu decoder, relu-gain xavier init."""

    embedding_size: int
    y_size: int

    @nn.compact
    def __call__(self, h: Array, key: Array,
                 deterministic: bool = True) -> Tuple[Array, Array, Array]:
        init = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")
        z_mu = nn.Dense(self.embedding_size, kernel_init=init,
                        name="encode_mu")(h)
        z_lsgms = nn.Dense(self.embedding_size, kernel_init=init,
                           name="encode_lsgms")(h)
        if deterministic:
            z = z_mu
        else:
            eps = jax.random.normal(key, z_lsgms.shape, z_lsgms.dtype)
            z = eps * jnp.exp(0.5 * z_lsgms) + z_mu
        y = nn.relu(nn.Dense(self.embedding_size, kernel_init=init,
                             name="decode_1")(z))
        y = nn.Dense(self.y_size, kernel_init=init, name="decode_2")(y)
        return y, z_mu, z_lsgms


def deg_feature_similarity(f1, f2):
    """(reference model/graph_vae.py:188-190)"""
    return 1.0 / (jnp.abs(f1 - f2) + 1.0)


def edge_similarity_matrix(adj: Array, adj_recon: Array,
                           feat: Array, feat_recon: Array) -> Array:
    """Vectorized [N,N,N,N] edge affinity (reference
    model/graph_vae.py:152-172, which loops O(N^4) in python):
    S[i,j,a,b] = adj[i,j] adj[i,i] adj[j,j] rec[a,b] rec[a,a] rec[b,b]
    off-diagonal, and adj[i,i] rec[a,a] sim(deg_i, deg_a) on the (i==j, a==b)
    diagonal."""
    n = adj.shape[0]
    diag_a = jnp.diag(adj)
    diag_r = jnp.diag(adj_recon)
    off = (adj * diag_a[:, None] * diag_a[None, :])[:, :, None, None] * \
        (adj_recon * diag_r[:, None] * diag_r[None, :])[None, None, :, :]
    eye = jnp.eye(n, dtype=bool)
    # zero the a==b and i==j slices of the off-diagonal term
    off = jnp.where(eye[None, None, :, :], 0.0, off)
    off = jnp.where(eye[:, :, None, None], 0.0, off)
    diag_term = (diag_a[:, None] * diag_r[None, :]
                 * deg_feature_similarity(feat[:, None], feat_recon[None, :]))
    S = off
    ii = jnp.arange(n)
    S = S.at[ii[:, None], ii[:, None], ii[None, :], ii[None, :]].set(diag_term)
    return S


def mpm(x_init: Array, S: Array, max_iters: int = 50) -> Array:
    """Max-pooling matching power iteration (reference
    model/graph_vae.py:174-186), vectorized: x[i,a] <- x[i,a] S[i,i,a,a] +
    sum_{j != i} max_b x[j,b] S[i,j,a,b], normalized each round."""
    n = x_init.shape[0]
    ii = jnp.arange(n)
    diag_S = S[ii[:, None], ii[:, None], ii[None, :], ii[None, :]]
    not_self = 1.0 - jnp.eye(n)

    def body(x, _):
        pooled = jnp.max(x[None, :, None, :] * S, axis=-1)  # [i, j, a]
        neigh = jnp.einsum("ija,ij->ia", pooled, not_self)
        x_new = x * diag_S + neigh
        return x_new / jnp.maximum(jnp.linalg.norm(x_new), 1e-12), None

    x, _ = jax.lax.scan(body, x_init, None, length=max_iters)
    return x


def match_graphs(adj: np.ndarray, adj_recon: np.ndarray,
                 max_iters: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    """Degree-feature MPM affinity + Hungarian assignment (reference
    model/graph_vae.py:95-125). Host-side (scipy); returns (row_ind,
    col_ind)."""
    import scipy.optimize

    feat = adj.sum(1)
    feat_r = adj_recon.sum(1)
    S = edge_similarity_matrix(jnp.asarray(adj), jnp.asarray(adj_recon),
                               jnp.asarray(feat), jnp.asarray(feat_r))
    n = adj.shape[0]
    init = jnp.full((n, n), 1.0 / n)
    assignment = np.asarray(mpm(init, S, max_iters))
    return scipy.optimize.linear_sum_assignment(-assignment)


def permute_adj(adj: np.ndarray, curr_ind: np.ndarray,
                target_ind: np.ndarray) -> np.ndarray:
    """(reference model/graph_vae.py:192-203)"""
    n = adj.shape[0]
    ind = np.zeros(n, dtype=np.int64)
    ind[target_ind] = curr_ind
    out = adj[ind, :]
    return out[:, ind]


class EdgeConvGNN(nn.Module):
    """GIN rounds + tanh'd pairwise 2-channel edge features + 1x1 conv over
    the stacked [A, 1-A, edge0, edge1] channels (reference
    edge_gnn.py:114-182). The reference's Conv2d(k=1)+BatchNorm is a
    per-edge channel-mixing linear; implemented as a Dense over the channel
    axis + LayerNorm (batch statistics are jit/SPMD-hostile; documented
    deviation)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    node_norm: bool = False

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
            pair = node_feature_to_matrix(x)               # [B, N, N, 2H]
            edge = jnp.tanh(nn.Dense(2, name=f"edge_{i}")(pair))
            if self.node_norm:
                edge = edge / jnp.maximum(
                    jnp.linalg.norm(edge, axis=-1, keepdims=True), 1e-12)
            stacked = jnp.concatenate(
                [adj[..., None], 1.0 - adj[..., None], edge], axis=-1)
            mixed = nn.Dense(1, name=f"conv_{i}")(stacked)[..., 0]
            adj = nn.relu(nn.LayerNorm(name=f"conv_ln_{i}")(mixed))
            hidden_adj.append(adj)
        return sum(hidden_x), sum(hidden_adj)


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
