"""Score-matching noise utilities and dense-graph helpers.

Behavioral spec from reference src/module/graph_utils.py (derived upstream
from ermongroup/GraphScoreMatching). The reference draws from the global
torch RNG; here every draw takes an explicit `jax.random` key so the whole
train step stays jittable and reproducible under SPMD.

The reference ships two versions of each noise op - e.g. `add_edge_noise`
(graph_utils.py:152-159, scatter into the 630 upper-triangular slots) and
`add_edge_noise_v2` (:162-168, full-matrix draw masked to triu) - which are
distributionally identical. We implement the v2 masked form: it is the
XLA-friendly one (no scatter, static shapes).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _triu_mask(n: int, k: int = 1, dtype=jnp.float32) -> Array:
    return jnp.triu(jnp.ones((n, n), dtype=dtype), k=k)


def add_edge_noise(key: Array, adjs: Array, sigma: float = 0.2
                   ) -> Tuple[Array, Array]:
    """Symmetric Gaussian edge noise + score target (reference
    graph_utils.py:152-168).

    noise ~ N(0, sigma^2) on the strict upper triangle, symmetrized;
    grad_log = -noise / sigma^2 is the score of the noise kernel.
    """
    n = adjs.shape[-1]
    raw = jax.random.normal(key, adjs.shape, dtype=adjs.dtype) * sigma
    upper = raw * _triu_mask(n, 1, adjs.dtype)
    noise = upper + jnp.swapaxes(upper, -1, -2)
    grad_log_noise = -noise / (sigma ** 2)
    return adjs + noise, grad_log_noise


def apply_known_noise(x: Array, noise: Array, sigma: float
                      ) -> Tuple[Array, Array]:
    """Apply a pre-drawn noise tensor with the score target the reference
    noise ops would produce for that draw: (x + noise, -noise / sigma^2).
    Lets trajectory-parity tests replay noise recorded from the reference
    loop (graph_utils.py:133-168 semantics with injected epsilon)."""
    return x + noise.astype(x.dtype), -(noise.astype(jnp.float32)) / (sigma ** 2)


def add_feature_noise(key: Array, feats: Array, sigma: float = 0.2
                      ) -> Tuple[Array, Array]:
    """Gaussian node-feature noise + score target (reference
    graph_utils.py:133-149; the v1 per-node loop and v2 full-tensor draw are
    distributionally identical)."""
    noise = jax.random.normal(key, feats.shape, dtype=feats.dtype) * sigma
    return feats + noise, -noise / (sigma ** 2)


def add_gaussian_noise(key: Array, adjs: Array, sigma: float,
                       is_half: bool = False,
                       node_flags: Array | None = None
                       ) -> Tuple[Array, Array]:
    """Symmetric triu-sampled Gaussian adjacency noise + score target.

    Covers both reference variants: src/module/graph_utils.py:121-131 (no
    flags) and the GSM lineage src/model/graph_utils.py:124-139, which
    additionally masks the noisy adjacency AND the gradient by node_flags."""
    n = adjs.shape[-1]
    raw = jax.random.normal(key, adjs.shape, dtype=adjs.dtype) * sigma
    upper = raw * _triu_mask(n, 1, adjs.dtype)
    if is_half:
        upper = jnp.abs(upper)
    noise = upper + jnp.swapaxes(upper, -1, -2)
    out, grad = adjs + noise, -noise / (sigma ** 2)
    if node_flags is not None:
        out = mask_adjs(out, node_flags)
        grad = mask_adjs(grad, node_flags)
    return out, grad


def get_corrupt_k(key: Array, min_k: int = 0, max_k: int | None = None,
                  p: float = 0.5) -> Array:
    """Geometric corruption-count draw (reference graph_utils.py:45-50;
    numpy global RNG there, an explicit key here)."""
    k = jax.random.geometric(key, p) + min_k - 1
    if max_k is not None:
        k = jnp.minimum(k, max_k)
    return k


def toggle_edges(key: Array, adj: Array, count: int = 1) -> Array:
    """Uniformly toggle `count` edges of a single [N, N] 0/1 adjacency,
    symmetrically (reference toggle_edge_np, graph_utils.py:64-79 - numpy
    in-place there, functional here)."""
    count = min(count, adj.shape[-1])
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (count,), 0, adj.shape[0])
    y = jax.random.randint(ky, (count,), 0, adj.shape[1])
    change = 1.0 - adj[x, y]
    adj = adj.at[x, y].set(change)
    return adj.at[y, x].set(change)


def gen_list_of_data(key: Array, x: Array, adjs: Array, node_flags: Array,
                     sigma_list) -> Tuple[Array, Array, Array, list]:
    """Expand a batch into len(sigma_list) noisy copies (one noise level
    each) for multi-sigma score-network training (reference GSM lineage,
    src/model/graph_utils.py:89-121). Returns (x tiled, noisy adjs
    concatenated on batch, node_flags tiled, per-sigma grad_log list)."""
    noisy, grads = [], []
    for i, sigma in enumerate(sigma_list):
        a, g = add_gaussian_noise(jax.random.fold_in(key, i), adjs,
                                  float(sigma), node_flags=node_flags)
        noisy.append(a)
        grads.append(g)
    reps = len(sigma_list)
    return (jnp.tile(x, (reps, 1, 1)), jnp.concatenate(noisy, axis=0),
            jnp.tile(node_flags, (reps, 1)), grads)


def node_feature_to_matrix(x: Array) -> Array:
    """[B, N, F] -> [B, N, N, 2F] pairwise concat (reference
    graph_utils.py:6-15)."""
    b, n, f = x.shape
    xi = jnp.broadcast_to(x[:, :, None, :], (b, n, n, f))
    xj = jnp.broadcast_to(x[:, None, :, :], (b, n, n, f))
    return jnp.concatenate([xi, xj], axis=-1)


def mask_adjs(adjs: Array, node_flags: Array) -> Array:
    """Zero rows/cols of padded nodes (reference graph_utils.py:18-28).
    Supports channel-stacked adjacencies [B, C..., N, N] with flags [B, N]."""
    extra = adjs.ndim - node_flags.ndim - 1
    f = node_flags.reshape(node_flags.shape[0], *([1] * extra),
                           node_flags.shape[-1])
    return adjs * f[..., None, :] * f[..., :, None]


def pad_adjs(adj: Array, node_number: int) -> Array:
    """Pad a square adjacency to [node_number, node_number] (reference
    graph_utils.py:31-49)."""
    n = adj.shape[-1]
    if n > node_number:
        raise ValueError(f"adjacency ({n}) larger than target ({node_number})")
    pad = node_number - n
    return jnp.pad(adj, ((0, pad), (0, pad)))


def add_self_loops(adjs: Array) -> Array:
    """Set the diagonal to 1 (reference graph_utils.py:52-56)."""
    n = adjs.shape[-1]
    eye = jnp.eye(n, dtype=adjs.dtype)
    return adjs * (1.0 - eye) + eye


def remove_self_loops(adjs: Array) -> Array:
    """Zero the diagonal (reference graph_utils.py:59-61)."""
    n = adjs.shape[-1]
    return adjs * (1.0 - jnp.eye(n, dtype=adjs.dtype))


def check_adjs_symmetry(adjs: Array, atol: float = 1e-5) -> Array:
    """Symmetry invariant as a checkable value (reference
    graph_utils.py:82-86 no-ops unless debugging; here it returns the max
    asymmetry so tests/debug hooks can assert on it)."""
    return jnp.max(jnp.abs(adjs - jnp.swapaxes(adjs, -1, -2)))
