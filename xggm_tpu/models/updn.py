"""Bottom-Up-Top-Down (UpDn) VQA building blocks.

Behavioral port of the reference's UpDn lineage modules (SURVEY.md §2.7):
src/module/fc.py:6-24 (FCNet), attention.py:7-57 (Attention/NewAttention),
classifier.py:20-33 (SimpleClassifier), gaussian.py:9-37 (GaussianLayer),
language_model.py:7-75 (WordEmbedding/QuestionEmbedding),
image_sentence_ranking.py:10-60 (cosine_sim/ContrastiveLoss).

Weight-normalized Linear layers are implemented with flax's WeightNorm
wrapper (dim=None semantics: a single scalar norm per kernel).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _wn_dense(features: int, name: str | None = None) -> nn.Module:
    """weight_norm(nn.Linear(..), dim=None): scalar-norm weight
    reparameterization."""
    return nn.WeightNorm(nn.Dense(features), feature_axes=None, name=name)


class FCNet(nn.Module):
    """Weight-normed Linear+ReLU stack (reference fc.py:6-24); note the
    reference applies ReLU after the LAST layer too."""

    dims: Sequence[int]  # [in, hid..., out]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dims[1:]):
            x = nn.relu(_wn_dense(d, name=f"fc_{i}")(x))
        return x


class Attention(nn.Module):
    """Concat attention over objects (reference attention.py:7-29)."""

    num_hid: int

    @nn.compact
    def __call__(self, v: Array, q: Array) -> Array:
        k = v.shape[1]
        q_tiled = jnp.broadcast_to(q[:, None, :], (q.shape[0], k, q.shape[1]))
        joint = FCNet((v.shape[-1] + q.shape[-1], self.num_hid),
                      name="nonlinear")(jnp.concatenate([v, q_tiled], 2))
        logits = _wn_dense(1, name="linear")(joint)
        return jax.nn.softmax(logits, axis=1)


class NewAttention(nn.Module):
    """Projected product attention (reference attention.py:31-57)."""

    num_hid: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, v: Array, q: Array,
                 deterministic: bool = True) -> Array:
        k = v.shape[1]
        v_proj = FCNet((v.shape[-1], self.num_hid), name="v_proj")(v)
        q_proj = FCNet((q.shape[-1], self.num_hid), name="q_proj")(q)
        joint = v_proj * jnp.broadcast_to(q_proj[:, None, :],
                                          (q.shape[0], k, self.num_hid))
        joint = nn.Dropout(self.dropout)(joint, deterministic=deterministic)
        logits = _wn_dense(1, name="linear")(joint)
        return jax.nn.softmax(logits, axis=1)


class SimpleClassifier(nn.Module):
    """Linear-ReLU-Dropout-Linear head (reference classifier.py:20-33)."""

    hid_dim: int
    out_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.relu(nn.Dense(self.hid_dim)(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out_dim)(x)


class GaussianLayer(nn.Module):
    """Per-class diagonal-gaussian log-likelihood layer (reference
    gaussian.py:9-37)."""

    input_dim: int
    n_classes: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        centers = self.param(
            "centers", lambda k, s: 0.5 * jax.random.normal(k, s),
            (self.n_classes, self.input_dim))
        covs = self.param(
            "covs",
            lambda k, s: 0.2 + jax.random.exponential(k, s) * 0.5,
            (self.n_classes, self.input_dim))
        eps = jnp.finfo(jnp.float32).eps
        diff = x[:, None, :] - centers[None, :, :]
        z_log = -0.5 * jnp.sum(jnp.log(covs), -1) \
            - 0.5 * self.input_dim * jnp.log(2 * jnp.pi)
        exp_log = -0.5 * jnp.sum(diff * (1.0 / (covs + eps)) * diff, -1)
        out = z_log[None, :] + exp_log
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1,
                                                 keepdims=True), 1e-12)


class WordEmbedding(nn.Module):
    """Embedding with an extra padding row at index ntoken (reference
    language_model.py:7-28)."""

    ntoken: int
    emb_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        emb = nn.Embed(self.ntoken + 1, self.emb_dim, name="emb")(x)
        return nn.Dropout(self.dropout)(emb, deterministic=deterministic)


class QuestionEmbedding(nn.Module):
    """GRU/LSTM question encoder returning the last hidden state (reference
    language_model.py:31-75); bidirectional concatenates the backward pass's
    first-step output, exactly as the reference."""

    num_hid: int
    nlayers: int = 1
    bidirect: bool = False
    rnn_type: str = "GRU"

    def _cell(self, name):
        if self.rnn_type == "LSTM":
            return nn.OptimizedLSTMCell(self.num_hid, name=name)
        return nn.GRUCell(self.num_hid, name=name)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_f = x
        for layer in range(self.nlayers):
            out_f = nn.RNN(self._cell(f"fwd_{layer}"))(out_f)
        if not self.bidirect:
            return out_f[:, -1]
        out_b = x[:, ::-1]
        for layer in range(self.nlayers):
            out_b = nn.RNN(self._cell(f"bwd_{layer}"))(out_b)
        # torch's output[:, 0, hid:] is the backward RNN's full pass ending
        # at t=0, i.e. our reversed scan's last step
        return jnp.concatenate([out_f[:, -1], out_b[:, -1]], axis=1)

    def forward_all(self, x: Array) -> Array:
        out = x
        for layer in range(self.nlayers):
            out = nn.RNN(self._cell(f"fwd_{layer}"))(out)
        return out


def cosine_sim(images: Array, captions: Array) -> Array:
    """Cosine similarity matrix (reference image_sentence_ranking.py:10-14)."""
    im = images / jnp.maximum(
        jnp.linalg.norm(images, axis=1, keepdims=True), 1e-8)
    s = captions / jnp.maximum(
        jnp.linalg.norm(captions, axis=1, keepdims=True), 1e-8)
    return im @ s.T


def contrastive_loss(images_embedded: Array, captions_embedded: Array,
                     margin: float = 0.2, max_violation: bool = True
                     ) -> Array:
    """Bidirectional ranking loss (reference ContrastiveLoss,
    image_sentence_ranking.py:32-60)."""
    scores = cosine_sim(images_embedded, captions_embedded)
    diagonal = jnp.diag(scores)[:, None]
    cost_s = jnp.clip(margin + scores - diagonal, 0.0)
    cost_im = jnp.clip(margin + scores - diagonal.T, 0.0)
    eye = jnp.eye(scores.shape[0], dtype=bool)
    cost_s = jnp.where(eye, 0.0, cost_s)
    cost_im = jnp.where(eye, 0.0, cost_im)
    if max_violation:
        return jnp.sum(jnp.max(cost_s, axis=1)) + \
            jnp.sum(jnp.max(cost_im, axis=0))
    return jnp.sum(cost_s) + jnp.sum(cost_im)
