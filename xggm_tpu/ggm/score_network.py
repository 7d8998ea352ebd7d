"""Score-based graph generation lineage: EDP-GNN score network + utilities.

Behavioral spec from the reference's vendored GraphScoreMatching code
(reference src/model/edp_gnn.py:11-121, src/model/gin.py:75-235,
src/model/mlp.py:6-106) - the research lineage behind X-GGM's noise
utilities (SURVEY.md §2.7). Re-architected for XLA:

* multi-channel dense message passing is one einsum over [B, C, N, N]
  adjacency stacks (MXU-batched), not per-channel bmm loops;
* the edge-MLP runs on [B, N, N, F] pair features directly - XLA fuses the
  pointwise chain; no view(-1) reshaping;
* per-sigma conditional gains/biases (ConditionalLayer1d) are a vectorized
  gather over a [num_classes, F] table.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xggm_tpu.ops.noise import mask_adjs, node_feature_to_matrix

Array = jax.Array


class ConditionalScale(nn.Module):
    """Per-class gain/bias (reference ConditionalLayer1d, mlp.py:6-31).
    Input [num_classes * B, ..., F]; class id = leading-dim group."""

    num_features: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gain = self.param("gain",
                          lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
                          (self.num_classes, self.num_features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_classes, self.num_features))
        shape = x.shape
        grouped = x.reshape(self.num_classes, -1, self.num_features)
        out = grouped * gain[:, None, :] + bias[:, None, :]
        return out.reshape(shape)


class CondMLP(nn.Module):
    """MLP with optional per-class conditioning (reference MLP,
    mlp.py:34-106). The reference's BatchNorm1d is replaced by LayerNorm -
    batch statistics are hostile to jit/SPMD and this network is generative
    lineage, not a checkpoint-parity surface (documented deviation)."""

    num_layers: int
    hidden_dim: int
    output_dim: int
    num_classes: int = 0
    use_norm: bool = False
    activation: Any = nn.elu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.num_layers == 1:
            return nn.Dense(self.output_dim, name="linear")(x)
        h = x
        for i in range(self.num_layers - 1):
            h = nn.Dense(self.hidden_dim, name=f"fc_{i}")(h)
            if self.use_norm:
                h = nn.LayerNorm(name=f"norm_{i}")(h)
            if self.num_classes:
                h = ConditionalScale(self.hidden_dim, self.num_classes,
                                     name=f"cond_{i}")(h)
            h = self.activation(h)
        return nn.Dense(self.output_dim, name=f"fc_{self.num_layers - 1}")(h)


class MultiChannelGIN(nn.Module):
    """Multi-channel GIN over [B, C, N, N] adjacency stacks (reference
    MultiLayerGIN, model/gin.py:75-235): per layer
    h = concat_c(A_c @ x) + eps_k * tile(x, C) -> linear -> tanh, with a
    jumping-knowledge leaky-relu readout."""

    feature_nums: Sequence[int]  # [F_0, F_1, ...]
    out_dim: int = 1
    channel_num: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, adjs: Array, node_flags: Array,
                 deterministic: bool = True) -> Array:
        if adjs.ndim == 3:
            adjs = adjs[:, None]
        x = x * node_flags[..., None]
        layer_n = len(self.feature_nums) - 1
        eps = self.param("eps", nn.initializers.zeros, (layer_n,))

        hidden = [x]
        h = x
        for k in range(layer_n):
            h_norm = nn.LayerNorm(name=f"norm_{k}")(h)
            # B x C x N x F -> B x N x C*F
            msg = jnp.einsum("bcij,bjf->bcif", adjs, h_norm,
                             preferred_element_type=jnp.float32)
            msg = jnp.moveaxis(msg, 1, 2).reshape(
                h.shape[0], h.shape[1], -1)
            tiled = jnp.concatenate([h_norm] * self.channel_num, axis=-1)
            z = msg + eps[k] * tiled
            z = nn.Dense(self.feature_nums[k + 1], name=f"layer_{k}")(z)
            h = jnp.tanh(z)
            hidden.append(h * node_flags[..., None])

        # jumping-knowledge readout (model/gin.py:188-199)
        ret = 0.0
        for i, hh in enumerate(hidden):
            y = nn.Dense(2 * max(self.feature_nums), name=f"proj_{i}_a")(hh)
            y = nn.leaky_relu(y)
            y = nn.Dense(self.out_dim, name=f"proj_{i}_b")(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            ret = ret + y
        return ret


class EdgeDensePredictionLayer(nn.Module):
    """GNN + pairwise edge MLP -> multi-channel adjacency update (reference
    EdgeDensePredictionGNNLayer, edp_gnn.py:11-44)."""

    gnn_features: Sequence[int]
    c_in: int
    c_out: int
    num_classes: int = 1

    @nn.compact
    def __call__(self, x: Array, adjs: Array, node_flags: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        gnn_out_dim = self.gnn_features[-1]
        x_o = MultiChannelGIN(self.gnn_features, out_dim=gnn_out_dim,
                              channel_num=self.c_in, name="gnn")(
            x, adjs, node_flags, deterministic)
        pair = node_feature_to_matrix(x_o)              # B x N x N x 2F
        last = jnp.moveaxis(adjs, 1, -1)                # B x N x N x C_in
        mlp_in = jnp.concatenate([last, pair], axis=-1)
        out = CondMLP(num_layers=2,
                      hidden_dim=2 * max(self.c_in, self.c_out),
                      output_dim=self.c_out, num_classes=self.num_classes,
                      use_norm=True, name="translate")(mlp_in)
        new_adjs = jnp.moveaxis(out, -1, 1)             # B x C_out x N x N
        new_adjs = new_adjs + jnp.swapaxes(new_adjs, -1, -2)
        new_adjs = mask_adjs(new_adjs, node_flags)
        return x_o, new_adjs


class EdgeDenseScoreNetwork(nn.Module):
    """Adjacency score estimator (reference
    EdgeDensePredictionGraphScoreNetwork, edp_gnn.py:47-121): stack
    [A, 1-A] channels, one edge-GNN layer, concat channel stacks, final
    pairwise MLP -> per-edge score with zeroed diagonal."""

    feature_nums: Sequence[int]
    channel_out: int = 8
    num_classes: int = 1

    @nn.compact
    def __call__(self, x: Array, adjs: Array, node_flags: Array,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        a = adjs[:, None]                                    # B x 1 x N x N
        stacked = jnp.concatenate([a, 1.0 - a], axis=1)      # B x 2 x N x N
        stacked = mask_adjs(stacked, node_flags)
        x_o, new_adjs = EdgeDensePredictionLayer(
            self.feature_nums, c_in=2, c_out=self.channel_out,
            num_classes=self.num_classes, name="edge_gnn")(
            x, stacked, node_flags, deterministic)
        all_adjs = jnp.concatenate([stacked, new_adjs], axis=1)
        mlp_in = jnp.moveaxis(all_adjs, 1, -1)               # B x N x N x C
        c_total = 2 + self.channel_out
        score = CondMLP(num_layers=2, hidden_dim=2 * c_total, output_dim=1,
                        num_classes=self.num_classes, use_norm=False,
                        name="final_read_score")(mlp_in)[..., 0]
        n = score.shape[-1]
        score = score * (1.0 - jnp.eye(n, dtype=score.dtype))
        return score, x_o


def gen_init_sample(key: Array, batch_size: int, max_node_num: int
                    ) -> Tuple[Array, Array]:
    """|N(0,1)| symmetric initial adjacency (reference langevin_mc.py:40-49)."""
    raw = jnp.abs(jax.random.normal(
        key, (batch_size, max_node_num, max_node_num)))
    upper = jnp.triu(raw, k=1)
    adjs = upper + jnp.swapaxes(upper, -1, -2)
    node_flags = (adjs.sum(-1) > 1e-5).astype(jnp.float32)
    return adjs, node_flags


class LangevinSampler:
    """Annealed Langevin dynamics over adjacency matrices (reference
    LangevinMCSampler, langevin_mc.py:14-144), functional-RNG and jittable:
    each step adds symmetric N(0, sigma^2) noise then ascends the estimated
    score: A <- A + noise; A <- A + step_size * score(A)."""

    def __init__(self, eps: float = 0.3, grad_step_size: float = 1.0,
                 step_num: int = 100):
        self.eps = eps
        self.grad_step_size = grad_step_size
        self.sigma = float(jnp.sqrt(2.0 * grad_step_size) * eps)
        self.step_num = step_num

    def sample(self, key: Array, score_func, init_adjs: Array,
               node_flags: Array, step_num: int | None = None,
               to_int: bool = True) -> Tuple[Array, Array]:
        steps = step_num if step_num is not None else self.step_num

        def body(carry, k):
            adjs = carry
            raw = jax.random.normal(k, adjs.shape) * self.sigma
            upper = jnp.triu(raw, k=1)
            adjs = adjs + upper + jnp.swapaxes(upper, -1, -2)
            adjs = mask_adjs(adjs, node_flags)
            score, _ = score_func(adjs, node_flags)
            return adjs + self.grad_step_size * score, None

        keys = jax.random.split(key, steps)
        adjs, _ = jax.lax.scan(body, init_adjs, keys)
        if to_int:
            adjs = jnp.where(adjs < 0.5, 0.0, 1.0)
        node_flags = (adjs.sum(-1) > 1e-5).astype(jnp.float32)
        return adjs, node_flags


def gen_multi_sigma_batches(key: Array, x: Array, adjs: Array,
                            sigma_list: Sequence[float]
                            ) -> Tuple[Array, Array, Array]:
    """Flagless multi-sigma noisy batches for annealed score-matching
    training with this module's edge noise. The reference-faithful
    `gen_list_of_data` (node flags, per-sigma grad list, GSM lineage
    src/model/graph_utils.py:89-121) lives in `xggm_tpu.ops.noise`."""
    from xggm_tpu.ops.noise import add_edge_noise

    xs, noisy, grads = [], [], []
    for i, sigma in enumerate(sigma_list):
        k = jax.random.fold_in(key, i)
        a, g = add_edge_noise(k, adjs, sigma)
        xs.append(x)
        noisy.append(a)
        grads.append(g)
    return (jnp.concatenate(xs, axis=0), jnp.concatenate(noisy, axis=0),
            jnp.concatenate(grads, axis=0))
