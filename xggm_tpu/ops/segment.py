"""Segment ops: the TPU-native replacement for the reference's one native
extension call, `torch_scatter.scatter_add` inside `to_dense_batch`
(reference src/tools/to_dense_batch.py:2,36).

On TPU the sparse->dense graph batching is `jax.ops.segment_sum` plus a
static-shape scatter - no custom CUDA op needed; XLA lowers segment_sum to
efficient one-hot matmuls/sorted reductions.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    """Sum `data` rows by segment id (drop-in for torch_scatter.scatter_add
    along dim 0)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def to_dense_batch(x: Array, batch: Array, num_graphs: int,
                   max_num_nodes: Optional[int] = None,
                   fill_value: float = 0.0) -> Tuple[Array, Array]:
    """PyG-style sparse->dense batching (reference
    src/tools/to_dense_batch.py:5-56).

    Args:
      x: [total_nodes, F] stacked node features of all graphs.
      batch: [total_nodes] graph id per node (sorted, as in PyG).
      num_graphs: static number of graphs B.
      max_num_nodes: static max nodes per graph N (computed from data if None,
        which forces a host sync - pass it when under jit).

    Returns:
      dense: [B, N, F] padded node features.
      mask:  [B, N] True for real nodes.
    """
    num_nodes = segment_sum(jnp.ones_like(batch), batch, num_graphs)
    if max_num_nodes is None:
        max_num_nodes = int(jax.device_get(jnp.max(num_nodes)))

    cum = jnp.concatenate([jnp.zeros((1,), num_nodes.dtype),
                           jnp.cumsum(num_nodes)[:-1]])
    # position of each node within its graph
    idx_in_graph = jnp.arange(batch.shape[0]) - cum[batch]
    flat_idx = batch * max_num_nodes + idx_in_graph

    dense = jnp.full((num_graphs * max_num_nodes, x.shape[-1]), fill_value,
                     dtype=x.dtype)
    dense = dense.at[flat_idx].set(x)
    dense = dense.reshape(num_graphs, max_num_nodes, x.shape[-1])

    mask = (jnp.arange(max_num_nodes)[None, :] < num_nodes[:, None])
    return dense, mask
