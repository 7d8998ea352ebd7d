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

from xggm_tpu.ops.basic import gelu

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


class MIUpperBound(nn.Module):
    """'Modified CLUBv2' upper bound (reference mi.py:301-392): optional
    variational q(y|x) with GELU heads and tanh'd logvar, plus the
    parameter-free org/sample estimates (randperm negatives)."""

    variational: bool = False
    y_dim: int = 0
    hidden_size: int = 0

    def setup(self):
        if self.variational:
            h = self.hidden_size // 2
            # exact erf GeLU: torch nn.GELU (reference mi.py:310-317), not
            # flax's default tanh approximation
            self.p_mu = nn.Sequential([nn.Dense(h), gelu,
                                       nn.Dense(self.y_dim)])
            self.p_logvar = nn.Sequential([nn.Dense(h), gelu,
                                           nn.Dense(self.y_dim), jnp.tanh])

    def mi_est_sample_variational(self, x_samples, y_samples, key):
        mu, logvar = self.p_mu(x_samples), self.p_logvar(x_samples)
        perm = jax.random.permutation(key, y_samples.shape[0])
        positive = -((mu - y_samples) ** 2) / jnp.exp(logvar)
        negative = -((mu - y_samples[perm]) ** 2) / jnp.exp(logvar)
        return jnp.mean(positive.sum(-1) - negative.sum(-1)) / 2.0

    def mi_est_org_variational(self, x_samples, y_samples):
        mu, logvar = self.p_mu(x_samples), self.p_logvar(x_samples)
        positive = -((mu - y_samples) ** 2) / 2.0 / jnp.exp(logvar)
        negative = -jnp.mean(
            (y_samples[None, :, :] - mu[:, None, :]) ** 2, axis=1
        ) / 2.0 / jnp.exp(logvar)
        return jnp.mean(positive.sum(-1) - negative.sum(-1))

    def __call__(self, x_samples, y_samples, key=None,
                 mi_mode: str = "original"):
        if mi_mode == "original":
            return self.mi_est_org_variational(x_samples, y_samples)
        if key is None:
            raise ValueError('mi_mode="sample" requires a PRNG key')
        return self.mi_est_sample_variational(x_samples, y_samples, key)


def mi_upper_bound_org(y_samples: Array) -> Array:
    """MIUpperBound.mi_est_org (reference mi.py:373-388): parameter-free."""
    negative = -jnp.mean(
        (y_samples[None, :, :] - y_samples[:, None, :]) ** 2, axis=1) / 2.0
    return jnp.mean(-negative.sum(-1))


def mi_upper_bound_sample(key: Array, y_samples: Array) -> Array:
    """MIUpperBound.mi_est_sample (reference mi.py:361-371): permutation
    negatives (vs CLUBv2-sample's with-replacement draw)."""
    perm = jax.random.permutation(key, y_samples.shape[0])
    negative = -((y_samples - y_samples[perm]) ** 2) / 2.0
    return jnp.mean(-negative.sum(-1))


class MIEstimator(nn.Module):
    """JSD-gradient / energy-based MI critic (reference mi.py:428-446):
    cat -> 1024 GELU -> 1024 GELU -> 1; negatives by rolling x1."""

    @nn.compact
    def __call__(self, x1: Array, x2: Array):
        net = nn.Sequential([nn.Dense(1024), gelu, nn.Dense(1024),
                             gelu, nn.Dense(1)])
        pos = net(jnp.concatenate([x1, x2], axis=1))
        neg = net(jnp.concatenate([jnp.roll(x1, 1, axis=0), x2], axis=1))
        grad = -jnp.mean(nn.softplus(-pos)) - jnp.mean(nn.softplus(neg))
        est = jnp.mean(pos) - jnp.mean(jnp.exp(neg)) + 1.0
        return grad, est


def _factorized_normal(z, hidden_size):
    mu, sigma = z[:, :hidden_size], z[:, hidden_size:]
    sigma = nn.softplus(sigma) + 1e-7
    return mu, sigma


def _normal_log_prob(x, mu, sigma):
    return jnp.sum(-0.5 * jnp.log(2 * jnp.pi) - jnp.log(sigma)
                   - 0.5 * ((x - mu) / sigma) ** 2, axis=-1)


class MVMIEstimator(nn.Module):
    """Multi-view MI objective (reference mi.py:449-503): factorized-Normal
    posteriors from [*, 2*hidden] heads, reparameterized samples, symmetric
    KL minus 2x the JSD MI gradient."""

    hidden_size: int = 384

    @nn.compact
    def __call__(self, p_z1: Array, p_z2: Array, key: Array) -> Array:
        mu1, s1 = _factorized_normal(p_z1, self.hidden_size)
        mu2, s2 = _factorized_normal(p_z2, self.hidden_size)
        k1, k2 = jax.random.split(key)
        z1 = mu1 + s1 * jax.random.normal(k1, mu1.shape)
        z2 = mu2 + s2 * jax.random.normal(k2, mu2.shape)
        mi_gradient, _ = MIEstimator()(z1, z2)
        kl_1_2 = _normal_log_prob(z1, mu1, s1) - _normal_log_prob(z1, mu2, s2)
        kl_2_1 = _normal_log_prob(z2, mu2, s2) - _normal_log_prob(z2, mu1, s1)
        d_skl_2 = jnp.mean(kl_1_2 + kl_2_1)
        return d_skl_2 - 2.0 * mi_gradient


class JointMIEstimator(nn.Module):
    """Cross-modal joint objective (reference mi.py:506-548): pool the 20
    language / 36 visual positions with learned 1-d projections, build
    factorized-Normal posteriors, return SKL/2 minus the InfoNCE estimate."""

    hidden_size: int = 384

    @nn.compact
    def __call__(self, zl: Array, zv: Array, key: Array) -> Array:
        z1 = nn.Dense(1, name="fc_l")(jnp.swapaxes(zl, 1, 2))[..., 0]
        z2 = nn.Dense(1, name="fc_v")(jnp.swapaxes(zv, 1, 2))[..., 0]
        mu1, s1 = _factorized_normal(z1, self.hidden_size)
        mu2, s2 = _factorized_normal(z2, self.hidden_size)
        k1, k2, k3 = jax.random.split(key, 3)
        z1 = mu1 + s1 * jax.random.normal(k1, mu1.shape)
        z2 = mu2 + s2 * jax.random.normal(k2, mu2.shape)
        kl_1_2 = _normal_log_prob(z1, mu1, s1) - _normal_log_prob(z1, mu2, s2)
        kl_2_1 = _normal_log_prob(z2, mu2, s2) - _normal_log_prob(z2, mu1, s1)
        d_skl = jnp.mean(kl_1_2 + kl_2_1) / 2.0
        mi_estimation = InfoNCE()(z1, z2, k3)
        return d_skl - mi_estimation


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
