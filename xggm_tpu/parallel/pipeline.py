"""GPipe-style pipeline parallelism over a homogeneous layer stack.

The reference tops out at single-process DataParallel (src/lxrt/entry.py:
103-104); the framework already goes beyond it with data parallelism,
tensor parallelism (parallel/mesh.param_shardings) and ZeRO optimizer-state
sharding (zero_state_shardings). This module adds the remaining classic
axis - PIPELINE parallelism - as a generic runner for homogeneous
[L, ...]-stacked layer parameters (the layout the `stacked_layers` opt-in
in models/lxmert.py produces): scale headroom for stacks whose *weights*
outgrow a chip, where TP's per-layer collectives would saturate ICI.

TPU-native design (shard_map + collectives, no per-device control flow):

  * the stack's S = mesh.shape[axis] stages each hold L/S consecutive
    layers' params - leaves reshape [L, ...] -> [S, L/S, ...] and shard
    P(axis) on the leading dim, so each stage's weights live only on its
    device;
  * the batch splits into M microbatches; a `lax.scan` over M + S - 1
    pipeline ticks runs each stage on its current microbatch and hands the
    activation to the next stage with `lax.ppermute` over ICI;
  * at tick t, stage s processes microbatch t - s; the first stage injects
    fresh microbatches, the last stage collects outputs. Bubble fraction is
    the textbook (S - 1) / (M + S - 1) - pick M >> S;
  * everything is differentiable (scan + ppermute + dynamic-update have
    exact transposes), so `jax.grad` through `gpipe_apply` yields the same
    gradients as the sequential stack - the backward pass runs as the
    reverse pipeline that AD derives.

The activation may be any PYTREE of [B, ...] arrays (all sharing the same
leading batch dim): the heterogeneous LXMERT runner (pipeline_lxmert.py)
carries {hidden, per-example attention biases} through the stages together.

Microbatching is exact for per-example layers (attention/MLP/LayerNorm act
row-wise), so the pipeline output equals the sequential full-batch output
to float tolerance; tests/test_pipeline.py pins forward and gradients, with
the real BertLayer among the bodies.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

Array = jax.Array


def stack_stages(stacked_params: Any, n_stages: int) -> Any:
    """[L, ...] leaves -> [S, L/S, ...] (stage-major) for P(axis) sharding."""

    def reshape(leaf):
        L = leaf.shape[0]
        if L % n_stages:
            raise ValueError(f"stack length {L} not divisible by "
                             f"{n_stages} pipeline stages")
        return leaf.reshape(n_stages, L // n_stages, *leaf.shape[1:])

    return jax.tree.map(reshape, stacked_params)


def gpipe_apply(layer_apply: Callable[[Any, Any, Any], Any],
                stacked_params: Any, x: Any, mesh: Mesh, *,
                axis: str = "pipe", n_microbatches: int,
                extra: Any = None, batch_axis: Optional[str] = None) -> Any:
    """Run x through L stacked layers, pipelined over mesh axis `axis`.

    layer_apply(params_i, x, extra) -> x applies ONE layer (params_i = the
    [i]-th slice of every stacked leaf); `extra` is broadcast unscanned
    (e.g. a replicated constant). x is a pytree of [B, ...] arrays sharing
    the batch dim, with B % n_microbatches == 0; the layer must preserve
    the pytree structure and shapes (leaves it doesn't transform - e.g.
    per-example attention biases - simply pass through). Returns the
    [B, ...]-leaved output pytree of the full stack.

    batch_axis: optional second mesh axis to ALSO shard each microbatch's
    rows over (dp x pp on one ('data', 'pipe') mesh): every 'data' slice
    runs its own pipeline over the same stage weights, and the per-tick
    ppermute moves only the local activation rows. The weights stay sharded
    over `axis` only (replicated over `batch_axis`).
    """
    S = mesh.shape[axis]
    x_leaves = jax.tree.leaves(x)
    if not x_leaves:
        raise ValueError("gpipe_apply needs at least one activation leaf")
    B = x_leaves[0].shape[0]
    if any(leaf.shape[0] != B for leaf in x_leaves):
        raise ValueError("all activation leaves must share the leading "
                         f"batch dim (got {[l.shape for l in x_leaves]})")
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    if batch_axis is not None and (B // M) % mesh.shape[batch_axis]:
        raise ValueError(
            f"microbatch rows {B}//{M}={B // M} not divisible by mesh axis "
            f"'{batch_axis}' size {mesh.shape[batch_axis]}; pick "
            f"n_microbatches so each microbatch splits evenly over the "
            f"data axis")
    staged = stack_stages(stacked_params, S)
    xm = jax.tree.map(lambda a: a.reshape(M, B // M, *a.shape[1:]), x)
    # the scan carry (and output buffers) take the LAYER'S output
    # shape/dtype - probe it abstractly; a stack is only scannable if each
    # layer preserves the activation tree, so fail loudly here if not
    mb_aval = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), xm)
    y_aval = jax.eval_shape(
        layer_apply, jax.tree.map(lambda a: a[0], stacked_params),
        mb_aval, extra)
    if (jax.tree.structure(y_aval) != jax.tree.structure(mb_aval)
            or [a.shape for a in jax.tree.leaves(y_aval)]
            != [a.shape for a in jax.tree.leaves(mb_aval)]):
        raise ValueError(
            f"layer_apply changes the activation tree "
            f"({jax.tree.map(lambda a: a.shape, mb_aval)} -> "
            f"{jax.tree.map(lambda a: a.shape, y_aval)}); a homogeneous "
            f"stack must preserve it")
    xm = jax.tree.map(lambda a, y: a.astype(y.dtype), xm, y_aval)

    pspec = jax.tree.map(lambda _: P(axis), staged)

    def run(local_params, xm, extra):
        s = jax.lax.axis_index(axis)
        # local view: [1, L/S, ...] -> [L/S, ...]
        lp = jax.tree.map(lambda a: jnp.squeeze(a, 0), local_params)

        def stage(xin):
            def f(c, p):
                return layer_apply(p, c, extra), None

            out, _ = jax.lax.scan(f, xin, lp)
            return out

        T = M + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            recv, outbuf = carry
            # stage 0 injects microbatch t (clipped: past-M ticks feed a
            # dummy whose result is never consumed downstream in time to
            # be written - see the write guard below)
            mb_t = jnp.clip(t, 0, M - 1)
            cur = jax.tree.map(
                lambda a, r: jnp.where(s == 0, a[mb_t], r), xm, recv)
            y = stage(cur)
            # the last stage finishes microbatch t-(S-1) at tick t
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            write = jnp.logical_and(s == S - 1, t >= S - 1)

            def upd(buf, yl):
                prev = jax.lax.dynamic_index_in_dim(buf, out_idx, 0,
                                                    keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(write, yl, prev), out_idx, 0)

            outbuf = jax.tree.map(upd, outbuf, y)
            nxt = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), y)
            return (nxt, outbuf), None

        mb_zero = jax.tree.map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), xm)
        buf_zero = jax.tree.map(
            lambda a: jnp.zeros((M,) + a.shape[1:], a.dtype), xm)
        (_, outbuf), _ = jax.lax.scan(tick, (mb_zero, buf_zero),
                                      jnp.arange(T))
        return outbuf

    # ppermute + axis_index need the replication checker off; the kwarg was
    # renamed check_rep -> check_vma in jax 0.8
    import inspect

    kw = ("check_vma" if "check_vma"
          in inspect.signature(shard_map).parameters else "check_rep")
    # with a batch_axis, microbatch rows (dim 1 of [M, mb, ...]) shard over
    # it; stage weights and `extra` stay replicated across it
    bs = P(None, batch_axis) if batch_axis else P()
    os_ = P(axis, batch_axis) if batch_axis else P(axis)
    bspec = jax.tree.map(lambda _: bs, xm)
    ospec = jax.tree.map(lambda _: os_, xm)
    espec = jax.tree.map(lambda _: P(), extra)
    out = shard_map(
        run, mesh=mesh,
        in_specs=(pspec, bspec, espec),
        out_specs=ospec,
        **{kw: False},
    )(staged, xm, extra)
    # out leaves are [S*M, mb, ...]; the last stage's block holds the real
    # outputs
    return jax.tree.map(
        lambda a, xl: a[-M:].reshape(B, *xl.shape[1:]), out, x)


def sequential_apply(layer_apply: Callable[[Any, Any, Any], Any],
                     stacked_params: Any, x: Any,
                     extra: Any = None) -> Any:
    """Reference semantics: the same stack run sequentially (full batch).

    Mirrors gpipe_apply's activation-dtype handling: a layer that emits a
    different dtype than it consumes (e.g. fp32 in -> bf16 out) has its
    input cast up front so the scan carry is consistent - layer 0 then sees
    the same dtype later layers do, in both runners."""
    y_aval = jax.eval_shape(
        layer_apply, jax.tree.map(lambda a: a[0], stacked_params),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), x),
        extra)
    x = jax.tree.map(lambda a, y: a.astype(y.dtype), x, y_aval)

    def f(c, p):
        return layer_apply(p, c, extra), None

    out, _ = jax.lax.scan(f, x, stacked_params)
    return out
