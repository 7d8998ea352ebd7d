"""VQA debiasing loss functions.

Behavioral port of reference src/module/vqa_debias_loss_functions.py:67-207
(research lineage, SURVEY.md §2.7): Plain / Focal / ReweightByInvBias /
BiasProduct / LearnedMixin, operating on (hidden, logits, bias, labels)
batches. Parameterized variants (BiasProduct's smoothing scalar,
LearnedMixin's bias_lin + scalar) are flax modules; the rest pure functions.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def convert_sigmoid_logits_to_binary_logprobs(logits: Array
                                              ) -> Tuple[Array, Array]:
    """(log p, log (1-p)) for sigmoid logits (reference :20-27)."""
    neg = -jax.nn.softplus(-logits)        # log sigmoid(x)
    neg_inv = -logits - jax.nn.softplus(-logits)  # log sigmoid(-x)
    return neg, neg_inv


def elementwise_logsumexp(a: Array, b: Array) -> Array:
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def renormalize_binary_logits(a: Array, b: Array) -> Tuple[Array, Array]:
    norm = elementwise_logsumexp(a, b)
    return a - norm, b - norm


def _bce_mean(logits: Array, labels: Array) -> Array:
    x = logits
    t = labels
    per = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per)


def plain_loss(hidden: Array, logits: Array, bias: Array,
               labels: Array) -> Array:
    """BCE * num_answers (reference Plain, :67-72)."""
    return _bce_mean(logits, labels) * labels.shape[1]


def focal_loss(hidden: Array, logits: Array, bias: Array,
               labels: Array) -> Array:
    """(reference Focal, :75-83)"""
    focal_logits = jnp.log(jax.nn.softmax(logits, axis=1) + 1e-5) * \
        jnp.square(1.0 - jax.nn.softmax(bias, axis=1))
    return _bce_mean(focal_logits, labels) * labels.shape[1]


def reweight_by_inv_bias(hidden: Array, logits: Array, bias: Array,
                         labels: Array) -> Array:
    """(reference ReweightByInvBias, :86-96)"""
    log_p, log_1mp = convert_sigmoid_logits_to_binary_logprobs(logits)
    loss = -(log_p * labels + (1.0 - labels) * log_1mp)
    weights = 1.0 - bias
    return jnp.sum(loss * weights) / jnp.sum(weights)


class BiasProduct(nn.Module):
    """(reference BiasProduct, :99-137)"""

    smooth: bool = True
    smooth_init: float = -1.0
    constant_smooth: float = 0.0

    @nn.compact
    def __call__(self, hidden, logits, bias, labels):
        smooth = self.constant_smooth
        if self.smooth:
            p = self.param("smooth_param",
                           lambda k, s: jnp.full(s, self.smooth_init),
                           (1,))
            smooth = smooth + jax.nn.sigmoid(p)[0]
        bias_lp = jnp.log(bias + smooth)
        bias_l_inv = jnp.log1p(-bias + smooth)
        log_p, log_1mp = convert_sigmoid_logits_to_binary_logprobs(logits)
        log_p = log_p + bias_lp
        log_1mp = log_1mp + bias_l_inv
        log_p, log_1mp = renormalize_binary_logits(log_p, log_1mp)
        return jnp.mean(-(log_p * labels
                          + (1.0 - labels) * log_1mp).sum(1))


class LearnedMixin(nn.Module):
    """(reference LearnedMixin, :140-207)"""

    w: float
    hidden_dim: int = 1024
    smooth: bool = True
    smooth_init: float = -1.0
    constant_smooth: float = 0.0

    @nn.compact
    def __call__(self, hidden, logits, bias, labels):
        factor = jax.nn.softplus(nn.Dense(1, name="bias_lin")(hidden))
        b = jnp.stack([bias, 1.0 - bias], axis=2) + self.constant_smooth
        if self.smooth:
            p = self.param("smooth_param",
                           lambda k, s: jnp.full(s, self.smooth_init), (1,))
            b = b + jax.nn.sigmoid(p)[0]
        b = jnp.log(b) * factor[:, :, None]

        log_p, log_1mp = convert_sigmoid_logits_to_binary_logprobs(logits)
        both = b + jnp.stack([log_p, log_1mp], axis=2)
        log_p, log_1mp = renormalize_binary_logits(both[:, :, 0],
                                                   both[:, :, 1])
        loss = jnp.mean(-(log_p * labels + (1.0 - labels) * log_1mp).sum(1))

        bias_norm = elementwise_logsumexp(b[:, :, 0], b[:, :, 1])
        bias_logprob = b - bias_norm[:, :, None]
        entropy = jnp.mean(-(jnp.exp(bias_logprob) * bias_logprob).sum(2))
        return loss + self.w * entropy
