"""Loss functions with the reference's exact reductions.

Behavioral spec: reference src/gqa/gqa_ood.py:48-67 (score-matching +
symmetric KL + hinge), torch BCEWithLogitsLoss / CrossEntropyLoss /
SmoothL1Loss semantics used throughout the trainers.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def bce_with_logits(logits: Array, targets: Array,
                    weights: Optional[Array] = None) -> Array:
    """Mean binary cross-entropy with logits (torch BCEWithLogitsLoss).

    Uses the numerically-stable form
    max(x, 0) - x*t + log(1 + exp(-|x|)).
    `weights` (e.g. a padded-example mask broadcastable to `logits`) rescales
    per-element before the mean - used for SPMD eval-batch padding.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weights is None:
        return jnp.mean(per)
    w = jnp.broadcast_to(weights.astype(jnp.float32), per.shape)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def symmetric_kl(x: Array, y: Array,
                 weights: Optional[Array] = None) -> Array:
    """Symmetric KL of softmaxes over the last axis, elementwise-mean
    (reference compute_kl_loss, src/gqa/gqa_ood.py:54-61):
    mean( KL(py || px) + KL(px || py) ) with kl_div(log_px, py) = py*(log py - log px).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    log_px = jax.nn.log_softmax(x, axis=-1)
    log_py = jax.nn.log_softmax(y, axis=-1)
    px = jnp.exp(log_px)
    py = jnp.exp(log_py)
    kl = py * (log_py - log_px) + px * (log_px - log_py)
    if weights is None:
        return jnp.mean(kl)
    w = jnp.broadcast_to(weights.astype(jnp.float32), kl.shape)
    return jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)


def score_matching_loss(score: Array, grad_log_q_noise: Array,
                        sigma: float = 0.2,
                        weights: Optional[Array] = None) -> Array:
    """Denoising score-matching objective, per-matrix normalized (reference
    loss_func, src/gqa/gqa_ood.py:48-52):
    0.5*sigma^2 * mean_b( sum_{ij} (score - grad)^2 ) / (d1*d2).
    """
    diff = (score - grad_log_q_noise).astype(jnp.float32)
    per_ex = jnp.sum(jnp.square(diff), axis=(-1, -2))
    if weights is None:
        m = jnp.mean(per_ex)
    else:
        w = weights.astype(jnp.float32)
        m = jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)
    denom = score.shape[-1] * score.shape[-2]
    return 0.5 * (sigma ** 2) * m / denom


def cross_entropy(logits: Array, labels: Array,
                  ignore_index: int = -1,
                  reduction: str = "mean") -> Array:
    """Softmax cross-entropy with ignore_index (torch CrossEntropyLoss).
    labels == ignore_index contribute 0 and are excluded from the mean."""
    logits = logits.astype(jnp.float32)
    valid = (labels != ignore_index)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll
    count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(nll) / count


def smooth_l1(pred: Array, target: Array, beta: float = 1.0) -> Array:
    """Elementwise SmoothL1 (torch SmoothL1Loss reduction='none')."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def hinge_discriminator_loss(dis_fake: Array, dis_real: Array) -> Array:
    """Hinge GAN discriminator loss (reference loss_hinge_dis,
    src/gqa/gqa_ood.py:64-67)."""
    loss = jnp.mean(jax.nn.relu(1.0 - dis_real.astype(jnp.float32)))
    return loss + jnp.mean(jax.nn.relu(1.0 + dis_fake.astype(jnp.float32)))
