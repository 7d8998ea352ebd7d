"""Shared NN primitives (import-neutral: no package-level dependencies).

erf-GeLU (reference modeling.py:116-124), BERT-init Dense, and the two
LayerNorm flavors the reference mixes: eps 1e-12 (BertLayerNorm) and the
torch default 1e-5 (GGM modules)."""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def gelu(x: Array) -> Array:
    """erf-based GeLU, not the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def bert_normal_init(stddev: float = 0.02):
    return nn.initializers.normal(stddev=stddev)


def dense(features: int, dtype, name: Optional[str] = None,
          use_bias: bool = True, stddev: float = 0.02) -> nn.Dense:
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=bert_normal_init(stddev),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class LayerNormBase(nn.Module):
    """LayerNorm computed in float32 with configurable epsilon."""

    epsilon: float = 1e-12

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


class TorchLinear(nn.Module):
    """Dense with torch nn.Linear DEFAULT initialization: kaiming-uniform
    kernel (bound 1/sqrt(fan_in)) and uniform bias in the same bound.

    The reference applies BERT init (normal 0.02) only where it says so -
    `init_bert_weights` covers the encoder and logit_fc
    (gqa_ood_model.py:69); every GGM-side head (generator convs,
    encoder_adj, node_fc, fusion_fc, discriminators) is a plain nn.Linear
    with torch defaults. Matching the init DISTRIBUTION matters for
    blind from-scratch training comparisons (tools/blind_parity.py), not
    for checkpoint parity (loads overwrite it). Param names/shapes are
    identical to nn.Dense, so bridges/shardings/optimizer paths see no
    difference.
    """

    features: int
    dtype: Optional[object] = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (fan_in, self.features), jnp.float32)
        y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bound = 1.0 / float(np.sqrt(fan_in))

            def bias_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def torch_dense(features: int, dtype, name: Optional[str] = None,
                use_bias: bool = True) -> "TorchLinear":
    """dense()-shaped constructor for TorchLinear (drop-in at call sites)."""
    return TorchLinear(features=features, dtype=dtype, use_bias=use_bias,
                       name=name)
