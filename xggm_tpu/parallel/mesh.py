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
              devices: Optional[Sequence[Any]] = None,
              pipeline_parallel: int = 1) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices; with
    pipeline_parallel > 1 a ('data', 'model', 'pipe') mesh whose innermost
    axis carries the GPipe stages (parallel/pipeline_lxmert.py) - innermost
    so adjacent stages sit on ICI-adjacent chips for the per-tick
    ppermute."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    denom = model_parallel * pipeline_parallel
    if n % denom != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel} x pipeline_parallel="
                         f"{pipeline_parallel}")
    if pipeline_parallel > 1:
        grid = np.asarray(devices).reshape(
            n // denom, model_parallel, pipeline_parallel)
        return Mesh(grid, ("data", "model", "pipe"))
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


def param_shardings(params, mesh: Mesh, min_model_dim: int = 2048):
    """Tensor-parallel sharding rules for the parameter tree.

    Wide output projections (last kernel dim >= min_model_dim, e.g. the
    answer head over a 16k VQA vocabulary or the 3072-wide FFN intermediate)
    shard their output dim over the 'model' axis; matching biases shard too;
    everything else replicates. XLA's SPMD partitioner then splits those
    matmuls across the model axis and inserts the collectives - no model
    code changes (the reference has no TP at all; this is scale headroom).
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    model_size = mesh.shape.get("model", 1)
    shardings = []
    wide_bias_paths = set()
    # first pass: find wide kernels. ndim==2 = plain [in, out]; ndim==3 =
    # scan-stacked [L, in, out] (models/lxmert.py stacked_layers) - both
    # shard the output (last) dim over 'model'.
    wide = set()
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if (name.endswith("kernel") and leaf.ndim in (2, 3)
                and leaf.shape[-1] >= min_model_dim
                and leaf.shape[-1] % model_size == 0):
            wide.add(name)
            wide_bias_paths.add(name[: -len("kernel")] + "bias")
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if model_size > 1 and name in wide:
            spec = P(*([None] * (leaf.ndim - 1)), "model")
            shardings.append(NamedSharding(mesh, spec))
        elif model_size > 1 and name in wide_bias_paths and leaf.ndim in (1, 2):
            # stacked biases are [L, out]; plain biases [out]
            spec = P("model") if leaf.ndim == 1 else P(None, "model")
            shardings.append(NamedSharding(mesh, spec))
        else:
            shardings.append(NamedSharding(mesh, P()))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def _with_data_axis(spec, shape, data_size: int):
    """Add 'data' to the first unsharded dim divisible by the data-axis size.

    Used by the ZeRO-style optimizer-state sharding: a leaf that already
    carries a tensor-parallel 'model' axis keeps it (the result is a 2-D
    ('data', 'model') layout); a leaf with no divisible dim stays as-is
    (replicated over 'data')."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    for d, n in enumerate(shape):
        if parts[d] is None and n >= data_size and n % data_size == 0:
            parts[d] = "data"
            break
    return P(*parts)


def zero_state_shardings(state, mesh: Mesh, param_shardings_tree):
    """ZeRO-style sharding layout for a TrainState (training/steps.py).

    The reference has no distributed optimizer at all (its DataParallel
    keeps gradient math on device 0, src/lxrt/entry.py:103-104); this is the
    TPU-native scale-out layout for models whose optimizer state outgrows a
    chip: BertAdam's m/v moments - and, when the bf16 param shadow carries
    the compute copies (steps.bf16_param_shadow), the fp32 masters too -
    shard over the 'data' axis, so each chip holds 1/N of the fp32 state.
    The SPMD partitioner then lowers the update to reduce-scattered gradient
    shards + a bf16 all-gather of the refreshed shadow (ZeRO-1; see
    docs/PERF.md Multi-chip).

    Per-leaf placement:
      * m / v moments: the param's tensor-parallel spec + 'data' on the
        first unsharded divisible dim;
      * fp32 masters: same 'data' sharding - but ONLY for leaves whose
        compute copy lives in the bf16 shadow (fwd/bwd never read those
        masters); fp32-consumed masters (LayerNorm, embeddings - or all of
        them without a shadow) keep their original spec, since the forward
        reads them directly;
      * bf16 shadow leaves: the param's original (TP or replicated) spec -
        the forward reads them every step;
      * scalar bookkeeping (count, per-leaf counters, activation flags):
        replicated.

    Returns a TrainState-shaped pytree of NamedShardings (feed to
    `apply_state_shardings` and to the train-step builders'
    `state_shardings=`).
    """
    import jax

    from xggm_tpu.training.bert_adam import BertAdamState
    from xggm_tpu.training.steps import TrainState, _path_str

    if not isinstance(state.opt_state, BertAdamState):
        raise TypeError(
            f"shard_opt_state supports the per-leaf BertAdamState layout "
            f"only (got {type(state.opt_state).__name__}); the flat "
            f"single-buffer FlatBertAdamState variant has no ZeRO layout - "
            f"use the default (unfused) bert_adam with optimizer-state "
            f"sharding")

    data_size = mesh.shape.get("data", 1)
    rep = NamedSharding(mesh, P())

    def spec_of(sh):
        return sh.spec if isinstance(sh, NamedSharding) else P()

    def moment_sharding(leaf, psh):
        return NamedSharding(
            mesh, _with_data_axis(spec_of(psh), leaf.shape, data_size))

    shadow = state.params_bf16
    shadowed = set(shadow.keys()) if shadow is not None else set()

    def master_sharding(path, leaf, psh):
        if _path_str(path) in shadowed:
            return moment_sharding(leaf, psh)
        return psh

    params_sh = jax.tree_util.tree_map_with_path(
        master_sharding, state.params, param_shardings_tree)
    flat_psh = {_path_str(path): sh for path, sh
                in jax.tree_util.tree_leaves_with_path(param_shardings_tree)}

    opt = state.opt_state
    opt_sh = opt._replace(
        count=rep,
        m=jax.tree.map(moment_sharding, opt.m, param_shardings_tree),
        v=jax.tree.map(moment_sharding, opt.v, param_shardings_tree),
        leaf_count=jax.tree.map(lambda _: rep, opt.leaf_count),
        active=jax.tree.map(lambda _: rep, opt.active),
    )
    shadow_sh = None if shadow is None else {
        k: flat_psh.get(k, rep) for k in shadow}
    return TrainState(params_sh, opt_sh, shadow_sh)


def apply_state_shardings(state, shardings):
    """device_put every TrainState leaf onto its ZeRO sharding."""
    import jax

    return jax.tree.map(jax.device_put, state, shardings)


def maybe_zero_shard_state(state, mesh, param_shardings_tree, enabled: bool):
    """Validate + apply the ZeRO layout when `enabled`; the single entry
    point both trainers' _make_state calls (init, --resume and --load all
    restore the layout through it). Returns (state, shardings-or-None) -
    feed the shardings to the step builders' `state_shardings=`."""
    import jax

    if not enabled:
        return state, None
    if mesh is None:
        raise ValueError("shard_opt_state requires a device mesh "
                         "(--multiGPU)")
    # multi-host is supported: the checkpoint snapshot allgathers
    # cross-process-sharded leaves (checkpoint/manager.py -> to_host), and
    # restore re-places host arrays through this same call
    shardings = zero_state_shardings(state, mesh, param_shardings_tree)
    return apply_state_shardings(state, shardings), shardings


def axis_sharded_leaves(tree, axis: str = "data"):
    """Leaves whose sharding spec carries `axis` on any dim (axis tuples
    flattened) - the one spec-inspection idiom for ZeRO assertions."""
    import jax

    out = []
    for leaf in jax.tree.leaves(tree):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None) or ()
        dims = []
        for d in spec:
            dims.extend(d if isinstance(d, (tuple, list)) else (d,))
        if axis in dims:
            out.append(leaf)
    return out


def shard_like_params(tree, param_shardings_tree, mesh: Mesh):
    """Shard an optimizer-state tree whose leaves mirror params (m/v moments)
    with the params' shardings; non-mirroring leaves replicate."""
    import jax

    rep = NamedSharding(mesh, P())

    def place(subtree):
        try:
            return jax.tree.map(
                lambda x, s: jax.device_put(x, s), subtree,
                param_shardings_tree)
        except ValueError:
            return jax.tree.map(lambda x: jax.device_put(x, rep), subtree)

    return place(tree)


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
