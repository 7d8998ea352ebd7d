"""Graph generators and discriminators - the X-GGM paper's contribution.

Behavioral spec from reference src/module/graph_generative_modeling.py:
each generator runs n_layers rounds of (GNN over (x, adj) -> recompute
adj = sigmoid(normalize(x @ x^T)) with the diagonal zeroed), returning the
final (x, adj) (e.g. GCNGenerator, :199-233).

The adjacency recompute is three fused MXU/VPU ops on [B, 36, 36] tensors:
a batched gram matmul, a column-max normalize (adj[b,i,j] / max_k adj[b,k,i],
replicating torch's `adj / adj.max(dim=1)[0].unsqueeze(-1)`), sigmoid, and a
diagonal mask (`triu(1) + tril(-1)` == zero the diagonal).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xggm_tpu.ggm.gnn import GCN, GIN, GAT, LinearGeluLn
from xggm_tpu.ops.basic import dense, torch_dense

Array = jax.Array


def recompute_adjacency(x: Array) -> Array:
    """adj = zero_diag(sigmoid(gram / colmax)) (reference
    graph_generative_modeling.py:226-233)."""
    adj = jnp.einsum("bnd,bmd->bnm", x, x,
                     preferred_element_type=jnp.float32)
    # torch: adj / adj.max(dim=1)[0].unsqueeze(-1)
    adj = adj / jnp.max(adj, axis=1)[..., None]
    adj = jax.nn.sigmoid(adj)
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    return adj * (1.0 - eye)


def zero_diagonal(adj: Array) -> Array:
    """adj.triu(1) + adj.tril(-1) for batched square matrices."""
    n = adj.shape[-1]
    return adj * (1.0 - jnp.eye(n, dtype=adj.dtype))


class GCNGenerator(nn.Module):
    """n_layers x (2-conv GCN -> adjacency recompute)
    (reference graph_generative_modeling.py:199-233)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        for i in range(self.n_layers):
            x = GCN(hidden_dims=(self.hidden_dim, self.hidden_dim), n_layers=2,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"gnn_{i}")(x, adj, deterministic)
            adj = recompute_adjacency(x.astype(jnp.float32)).astype(adj.dtype)
        return x, adj


class GINGenerator(nn.Module):
    """n_layers x (1-conv GIN -> adjacency recompute)
    (reference graph_generative_modeling.py:162-197)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        for i in range(self.n_layers):
            x = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim), n_layers=1,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"gnn_{i}")(x, adj, deterministic)
            adj = recompute_adjacency(x.astype(jnp.float32)).astype(adj.dtype)
        return x, adj


class GATGenerator(nn.Module):
    """n_layers x (2-head GAT -> adjacency recompute)
    (reference graph_generative_modeling.py:236-269). Note the reference's
    merge='cat' doubles the latent dim per round - a latent shape bug if
    n_layers > 1; we keep the same structure but project back to hidden_dim
    after the concat so the generator is usable at any depth. Set
    `faithful_cat=True` to reproduce the raw reference shapes (only valid for
    n_layers == 1)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    n_head: int = 2
    faithful_cat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        for i in range(self.n_layers):
            x = GAT(features=self.hidden_dim, n_head=self.n_head,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"gnn_{i}")(x, adj, deterministic)
            if not self.faithful_cat:
                x = torch_dense(self.hidden_dim, self.dtype, name=f"merge_{i}")(x)
            adj = recompute_adjacency(x.astype(jnp.float32)).astype(adj.dtype)
        return x, adj


class EdgeGenerator(nn.Module):
    """Adjacency-only generator (reference graph_generative_modeling.py:100-130):
    GIN message passing but only the regenerated adjacency is returned (no
    sigmoid in the recompute, matching the reference)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.n_layers):
            x = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim), n_layers=1,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"gnn_{i}")(x, adj, deterministic)
            a = jnp.einsum("bnd,bmd->bnm", x, x,
                           preferred_element_type=jnp.float32)
            a = a / jnp.max(a, axis=1)[..., None]
            adj = zero_diagonal(a).astype(adj.dtype)
        return adj


class NodeGenerator(nn.Module):
    """Node-feature-only generator (reference
    graph_generative_modeling.py:133-159): GIN rounds over a fixed adjacency."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.n_layers):
            x = GIN(hidden_dims=(self.hidden_dim, self.hidden_dim), n_layers=1,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"gnn_{i}")(x, adj, deterministic)
        return x


class Discriminator(nn.Module):
    """Linear -> GeLU -> LN -> Linear on the flattened input
    (reference graph_generative_modeling.py:71-82)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape(x.shape[0], -1)
        h = LinearGeluLn(512, self.dtype, name="fc1")(x)
        return torch_dense(1, self.dtype, name="fc2")(h)


class DiscriminatorV2(nn.Module):
    """LeakyReLU MLP discriminator (reference
    graph_generative_modeling.py:85-97)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape(x.shape[0], -1)
        h = nn.leaky_relu(torch_dense(512, self.dtype, name="fc1")(x), 0.2)
        h = nn.leaky_relu(torch_dense(256, self.dtype, name="fc2")(h), 0.2)
        return torch_dense(1, self.dtype, name="fc3")(h)


def make_generator(gnn: str, hidden_dim: int, n_layers: int,
                   dropout: float = 0.5, dtype=jnp.float32,
                   gat_heads: int = 2) -> nn.Module:
    """Generator factory matching the reference's gnn switch
    (src/gqa/gqa_ood_model.py:71-81)."""
    if gnn == "GCN":
        return GCNGenerator(hidden_dim, n_layers, dropout, dtype)
    if gnn == "GIN":
        return GINGenerator(hidden_dim, n_layers, dropout, dtype)
    if gnn == "GAT":
        return GATGenerator(hidden_dim, n_layers, dropout,
                            n_head=gat_heads, dtype=dtype)
    raise ValueError(f"unknown gnn kind: {gnn!r} (expected GCN|GIN|GAT)")
