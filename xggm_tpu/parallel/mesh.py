"""SPMD device mesh + sharding rules.

The reference's only parallelism is single-process `nn.DataParallel`
(reference src/lxrt/entry.py:103-104, gated by --multiGPU src/param.py:108) -
replicate the module per GPU, scatter the batch, gather outputs. The
TPU-native equivalent is an explicit SPMD mesh:

  * 1-D mesh ('data',): batch sharded along `data`, params replicated.
    XLA inserts the gradient all-reduce over ICI automatically from the
    sharding annotations - no NCCL-style code anywhere.
  * Optional 2-D mesh ('data', 'model'): tensor-parallel sharding of the
    wide matmuls (FFN intermediate, attention heads, answer head) for scale
    headroom beyond the reference's capability.

Eval batches that don't divide the mesh are padded + masked
(`pad_batch_to`), replacing DataParallel's ragged gather semantics
(SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard along the leading (batch) axis of every leaf."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Array]) -> Dict[str, Array]:
    """Place a host batch onto the mesh, sharded along the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_to_device(mesh: Mesh, tree_batch, tree_repl=None):
    """device_put a batch (sharded) and optional replicated tree together."""
    out = shard_batch(mesh, tree_batch)
    if tree_repl is None:
        return out
    rep = jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), tree_repl)
    return out, rep


def pad_batch_to(batch: Dict[str, np.ndarray], size: int
                 ) -> tuple[Dict[str, np.ndarray], np.ndarray]:
    """Pad every leaf's leading dim to `size`; returns (padded, valid_mask).

    Replaces DataParallel's ragged last-batch gather for SPMD eval
    (reference uses bs=512 test batches, gqa_ood.py:453)."""
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    assert n <= size
    if n == size:
        return batch, np.ones((n,), np.bool_)
    pad = size - n

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths)

    mask = np.zeros((size,), np.bool_)
    mask[:n] = True
    return jax.tree.map(_pad, batch), mask
