"""Mutual-information estimator zoo.

Behavioral port of reference src/module/mi.py:11-603 (research lineage,
SURVEY.md §2.7): variational MI bounds used to analyze the cross-modal
representations. All estimators are flax modules over [sample_size, dim]
batches; shuffling is explicit-`jax.random` (the reference uses global torch
RNG). Formulas preserved exactly, including CLUB's mean-over-negatives and
MINE/NWJ/InfoNCE sign conventions (forward returns the NEGATIVE lower bound
for the maximizable bounds, as in the reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class _MuLogvarNet(nn.Module):
    """q(Y|X) gaussian head: Linear-ReLU-Linear mu + tanh'd logvar
    (reference mi.py:21-33)."""

    y_dim: int
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        h = self.hidden_size // 2
        mu = nn.Dense(self.y_dim)(nn.relu(nn.Dense(h)(x)))
        lv = jnp.tanh(nn.Dense(self.y_dim)(nn.relu(nn.Dense(h)(x))))
        return mu, lv


class _TNet(nn.Module):
    """Critic T(x,y): Linear-ReLU-Linear[-Softplus] (reference mi.py:131-136)."""

    hidden_size: int
    softplus: bool = False

    @nn.compact
    def __call__(self, xy):
        t = nn.Dense(1)(nn.relu(nn.Dense(self.hidden_size)(xy)))
        return nn.softplus(t) if self.softplus else t


class CLUB(nn.Module):
    """Contrastive Log-ratio Upper Bound (reference mi.py:11-49)."""

    y_dim: int
    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array) -> Array:
        mu, logvar = _MuLogvarNet(self.y_dim, self.hidden_size)(x_samples)
        positive = -((mu - y_samples) ** 2) / 2.0 / jnp.exp(logvar)
        negative = -jnp.mean(
            (y_samples[None, :, :] - mu[:, None, :]) ** 2, axis=1
        ) / 2.0 / jnp.exp(logvar)
        return jnp.mean(positive.sum(-1) - negative.sum(-1))


class CLUBSample(nn.Module):
    """Sampled CLUB (reference mi.py:52-80); permutation key explicit."""

    y_dim: int
    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array,
                 key: Array) -> Array:
        mu, logvar = _MuLogvarNet(self.y_dim, self.hidden_size)(x_samples)
        perm = jax.random.permutation(key, y_samples.shape[0])
        positive = -((mu - y_samples) ** 2) / jnp.exp(logvar)
        negative = -((mu - y_samples[perm]) ** 2) / jnp.exp(logvar)
        return jnp.mean(positive.sum(-1) - negative.sum(-1)) / 2.0


def club_v2_org(y_samples: Array) -> Array:
    """Parameter-free CLUBv2 (InfoBERT variant, reference mi.py:91-105)."""
    negative = -jnp.mean(
        (y_samples[None, :, :] - y_samples[:, None, :]) ** 2, axis=1) / 2.0
    return jnp.mean(-negative.sum(-1))


def club_v2_sample(key: Array, y_samples: Array) -> Array:
    """(reference mi.py:107-115)"""
    idx = jax.random.randint(key, (y_samples.shape[0],), 0,
                             y_samples.shape[0])
    negative = -((y_samples - y_samples[idx]) ** 2) / 2.0
    return jnp.mean(-negative.sum(-1))


class MINE(nn.Module):
    """Donsker-Varadhan lower bound; returns -bound (reference mi.py:128-152)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array,
                 key: Array) -> Array:
        t = _TNet(self.hidden_size)
        perm = jax.random.permutation(key, y_samples.shape[0])
        t0 = t(jnp.concatenate([x_samples, y_samples], -1))
        t1 = t(jnp.concatenate([x_samples, y_samples[perm]], -1))
        lower = jnp.mean(t0) - jnp.log(jnp.mean(jnp.exp(t1)))
        return -lower


class NWJ(nn.Module):
    """NWJ / f-divergence lower bound; returns -bound (reference
    mi.py:154-176)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array) -> Array:
        n = y_samples.shape[0]
        t = _TNet(self.hidden_size)
        t0 = t(jnp.concatenate([x_samples, y_samples], -1))
        x_tile = jnp.broadcast_to(x_samples[None], (n,) + x_samples.shape)
        y_tile = jnp.broadcast_to(y_samples[:, None], (n, n) +
                                  y_samples.shape[1:])
        t1 = t(jnp.concatenate([x_tile, y_tile], -1)) - 1.0
        lower = jnp.mean(t0) - jnp.mean(
            jnp.exp(jax.nn.logsumexp(t1, axis=1) - jnp.log(n)))
        return -lower


class VarUB(nn.Module):
    """Variational upper bound (reference mi.py:179-200)."""

    y_dim: int
    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array) -> Array:
        mu, logvar = _MuLogvarNet(self.y_dim, self.hidden_size)(x_samples)
        return 0.5 * jnp.mean(mu ** 2 + jnp.exp(logvar) - 1.0 - logvar)


class L1OutUB(nn.Module):
    """Leave-one-out upper bound (reference mi.py:202-265)."""

    y_dim: int
    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array) -> Array:
        n = y_samples.shape[0]
        mu, logvar = _MuLogvarNet(self.y_dim, self.hidden_size)(x_samples)
        positive = (-((mu - y_samples) ** 2) / 2.0 / jnp.exp(logvar)
                    - logvar / 2.0).sum(-1)
        all_probs = (-((y_samples[None, :, :] - mu[:, None, :]) ** 2)
                     / 2.0 / jnp.exp(logvar)[:, None, :]
                     - logvar[:, None, :] / 2.0).sum(-1)
        diag_mask = jnp.eye(n) * (-20.0)
        negative = jax.nn.logsumexp(all_probs + diag_mask, axis=0) \
            - jnp.log(n - 1.0)
        return jnp.mean(positive - negative)


class InfoNCE(nn.Module):
    """InfoNCE lower bound with a softplus critic (reference mi.py:268-298).
    Note the reference returns the POSITIVE bound here (quirk preserved)."""

    hidden_size: int = 300

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array,
                 key: Array) -> Array:
        n = y_samples.shape[0]
        t = _TNet(self.hidden_size, softplus=True)
        perm = jax.random.permutation(key, n)
        t0 = t(jnp.concatenate([x_samples, y_samples], -1))
        x_tile = jnp.broadcast_to(x_samples[None], (n,) + x_samples.shape)
        y_tile = jnp.broadcast_to(y_samples[perm][:, None], (n, n) +
                                  y_samples.shape[1:])
        t1 = t(jnp.concatenate([x_tile, y_tile], -1))
        lower = jnp.mean(t0) - (jnp.mean(jax.nn.logsumexp(t1[..., 0], axis=1))
                                - jnp.log(n))
        return lower


class InfoNCEv2(nn.Module):
    """Variant with sum-over-negatives (reference mi.py:394-421);
    returns -bound."""

    hidden_size: int

    @nn.compact
    def __call__(self, x_samples: Array, y_samples: Array,
                 key: Array) -> Array:
        n = y_samples.shape[0]
        t = _TNet(self.hidden_size, softplus=True)
        perm = jax.random.permutation(key, n)
        t0 = t(jnp.concatenate([x_samples, y_samples], -1))
        x_tile = jnp.broadcast_to(x_samples[None], (n,) + x_samples.shape)
        y_tile = jnp.broadcast_to(y_samples[perm][:, None], (n, n) +
                                  y_samples.shape[1:])
        t1 = t(jnp.concatenate([x_tile, y_tile], -1))[..., 0]
        lower = jnp.log(n) + jnp.mean(t0) - jnp.mean(t1.sum(1))
        return -lower


def knn_kl_estimator(s1: Array, s2: Array, k: int = 1) -> Array:
    """Brute-force k-NN KL(P||Q) estimator (reference naive_estimator,
    mi.py:562-585)."""
    n, m = s1.shape[0], s2.shape[0]
    d = s1.shape[1]
    nu = jnp.linalg.norm(s2[None, :, :] - s1[:, None, :], axis=-1)
    nu_k = jnp.sort(nu, axis=-1)[:, k - 1]
    rho = jnp.linalg.norm(s1[:, None, :] - s1[None, :, :], axis=-1)
    rho_k = jnp.sort(rho, axis=-1)[:, k]
    return jnp.log(m / (n - 1.0)) + (d / n) * jnp.sum(
        jnp.log(nu_k / rho_k))


def skl_divergence_knn(xl: Array, xv: Array) -> Array:
    """Symmetric k-NN KL (reference compute_skl_divergence, mi.py:551-559)."""
    return knn_kl_estimator(xl, xv) + knn_kl_estimator(xv, xl)
