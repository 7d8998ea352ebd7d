"""Shared NN primitives (import-neutral: no package-level dependencies).

erf-GeLU (reference modeling.py:116-124), BERT-init Dense, and the two
LayerNorm flavors the reference mixes: eps 1e-12 (BertLayerNorm) and the
torch default 1e-5 (GGM modules)."""
from __future__ import annotations

from typing import Optional

import jax
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
