"""Dense GNN blocks (GCN / GIN / GAT) over fixed 36-node graphs.

Behavioral spec from reference src/module/{gcn,gin,gat}.py. All graphs here
are dense [B, N, N] adjacency matrices with N=36, so message passing is a
batched matmul - ideal MXU work; no sparse gather/scatter is ever needed.

Numerics preserved from the reference:
* GCNConv (gcn.py:10-29):  LN(x + dropout(W(adj @ x))), W bias-free,
  LayerNorm with torch-default eps=1e-5.
* GCN (gcn.py:32-77): stacked convs + jumping-knowledge sum of per-depth
  (Linear -> GeLU -> LN) projections, each dropped out independently.
* GINConv (gin.py:10-35): (Linear -> GeLU -> LN)(x + (1+eps) * adj @ x) with
  a learnable scalar eps initialized to 0.
* GATConv (gat.py:6-49): additive attention a^T [h_i || h_j], LeakyReLU(0.2),
  mask adj==0 to -9e15, softmax, ELU(att @ h). The reference materializes
  [B, N*N, 2D] pair tensors; we use the algebraic identity
  a^T [h_i || h_j] = a_1^T h_i + a_2^T h_j, which XLA fuses into two small
  matmuls + a broadcast add (O(N*D) memory instead of O(N^2*D)).
* GAT (gat.py:52-79): multi-head concat merge => output dim n_head * hidden
  (the reference's latent dim growth, kept flag-compatible).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xggm_tpu.ops.basic import gelu, dense, torch_dense

Array = jax.Array

TORCH_LN_EPS = 1e-5  # torch nn.LayerNorm default, used by the GGM blocks


class TorchLayerNorm(nn.Module):
    """LayerNorm with eps=1e-5 (torch default), float32 internals."""

    epsilon: float = TORCH_LN_EPS

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig = x.dtype
        x = x.astype(jnp.float32)
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale
                + bias).astype(orig)


class LinearGeluLn(nn.Module):
    """Linear -> GeLU -> LayerNorm(eps 1e-5) projection used throughout the
    GGM module (e.g. reference gcn.py:44-47)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch-default init: the reference's GGM linears are plain
        # nn.Linear (no init_bert_weights; see ops.basic.TorchLinear)
        x = torch_dense(self.features, self.dtype, name="fc")(x)
        return TorchLayerNorm(name="ln")(gelu(x))


class GCNConv(nn.Module):
    """Residual graph convolution (reference gcn.py:10-29)."""

    features: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array, deterministic: bool = True) -> Array:
        msg = jnp.einsum("bij,bjd->bid", adj.astype(self.dtype), x,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        h = torch_dense(self.features, self.dtype, name="ctx_layer",
                        use_bias=False)(msg)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return TorchLayerNorm(name="layer_norm")(x + h)


class GCN(nn.Module):
    """Stacked GCNConvs + jumping-knowledge readout (reference gcn.py:32-77)."""

    hidden_dims: Sequence[int]
    n_layers: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array, deterministic: bool = True) -> Array:
        hidden_states = [x]
        for i in range(self.n_layers):
            x = GCNConv(x.shape[-1], dtype=self.dtype, name=f"conv_{i}")(
                x, adj, deterministic)
            hidden_states.append(x)
        ret = 0.0
        for i, h in enumerate(hidden_states):
            feats = self.hidden_dims[min(i, len(self.hidden_dims) - 1)]
            proj = LinearGeluLn(feats, self.dtype, name=f"proj_{i}")(h)
            ret = ret + nn.Dropout(self.dropout)(proj, deterministic=deterministic)
        return ret


class GINConv(nn.Module):
    """Graph isomorphism conv with learnable eps (reference gin.py:10-35)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array, deterministic: bool = True) -> Array:
        eps = self.param("eps", nn.initializers.zeros, (1,), jnp.float32)
        msg = jnp.einsum("bij,bjd->bid", adj.astype(self.dtype), x,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        h = x + (1.0 + eps.astype(self.dtype)) * msg
        return LinearGeluLn(self.features, self.dtype, name="linear")(h)


class GIN(nn.Module):
    """Stacked GINConvs + jumping-knowledge readout (reference gin.py:37-87)."""

    hidden_dims: Sequence[int]
    n_layers: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array, deterministic: bool = True) -> Array:
        hidden_states = [x]
        for i in range(self.n_layers):
            x = GINConv(self.hidden_dims[i], dtype=self.dtype,
                        name=f"conv_{i}")(x, adj, deterministic)
            hidden_states.append(x)
        ret = 0.0
        for i, h in enumerate(hidden_states):
            feats = self.hidden_dims[min(i, len(self.hidden_dims) - 1)]
            proj = LinearGeluLn(feats, self.dtype, name=f"proj_{i}")(h)
            ret = ret + nn.Dropout(self.dropout)(proj, deterministic=deterministic)
        return ret


class GATConv(nn.Module):
    """Dense graph attention head (reference gat.py:6-49)."""

    features: int
    alpha: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array, deterministic: bool = True) -> Array:
        # xavier-normal with relu gain sqrt(2) (reference gat.py:20-23)
        relu_gain_xavier = nn.initializers.variance_scaling(
            2.0, "fan_avg", "normal")
        h = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=relu_gain_xavier,
                     name="linear_layer")(x)
        # attn weight a in R^{2F}: score_ij = leaky_relu(a1.h_i + a2.h_j)
        a = self.param("attn", nn.initializers.xavier_normal(),
                       (2 * self.features, 1), jnp.float32).astype(self.dtype)
        a1, a2 = a[: self.features], a[self.features:]
        s_self = jnp.einsum("bnd,do->bno", h, a1)  # [B, N, 1]
        s_neigh = jnp.einsum("bnd,do->bno", h, a2)  # [B, N, 1]
        scores = s_self + jnp.swapaxes(s_neigh, 1, 2)  # [B, N, N]
        scores = nn.leaky_relu(scores, negative_slope=self.alpha)
        scores = jnp.where(adj == 0, jnp.asarray(-9e15, scores.dtype), scores)
        att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjd->bid", att, h,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.elu(out)


class GAT(nn.Module):
    """Multi-head GAT with concat merge (reference gat.py:52-79). Output dim
    is n_head * features under merge='cat', exactly as the reference."""

    features: int
    n_head: int = 2
    dropout: float = 0.5
    alpha: float = 0.2
    merge: str = "cat"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, adj: Array, deterministic: bool = True) -> Array:
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        heads = [
            GATConv(self.features, self.alpha, self.dtype, name=f"head_{i}")(
                x, adj, deterministic)
            for i in range(self.n_head)
        ]
        if self.merge == "cat":
            return jnp.concatenate(heads, axis=-1)
        return jnp.mean(jnp.stack(heads), axis=0)
