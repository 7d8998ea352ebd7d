"""BertAdam as an optax gradient transformation.

Behavioral spec from reference src/lxrt/optimization.py:27-203, reproduced
exactly - including the quirks that silently change training dynamics:

* NO bias correction (optimization.py:195-201): update = m/(sqrt(v)+eps).
* Decoupled weight decay applied to EVERY parameter (the reference trainers
  never build no-decay groups): update += wd * p (optimization.py:170-171).
* Per-step scheduled lr with `progress = step / t_total` evaluated BEFORE the
  step counter increments (optimization.py:176-195) - so the very first
  optimizer step applies lr = 0 under warmup schedules.
* PER-PARAM step counters with lazy activation (optimization.py:130-142,195
  under torch 1.7.1, the reference's pinned version): a parameter is skipped
  entirely until the first update where it has a gradient (`p.grad is None`
  -> continue); torch 1.7.1's zero_grad() keeps zeroed grad tensors
  afterwards, so from first participation on the param updates EVERY
  optimizer step (moment decay + weight decay on zero grads) with its OWN
  counter starting at 0. With X-GGM's branch structure this matters: e.g.
  node_fc only joins at the first representation batch and starts its warmup
  there. Participation is detected as `any(g != 0)` - an all-zero gradient
  tensor for a genuinely participating leaf does not occur in practice, and
  XLA constant-folds the check for leaves that are symbolically zero.
* warmup_linear is triangular and hits zero at t_total
  (optimization.py:42-48).
* Per-group lr: the reference runs downstream params at 4x the encoder lr
  (src/gqa/gqa_ood.py:118-137); here that is an `lr_scale` pytree of scalar
  multipliers (1.0 = base lr).
* Gradient clipping stays EXTERNAL (global-norm clip 5.0 in the trainers,
  gqa_ood.py:230) - chain optax.clip_by_global_norm before this transform.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Callable, Any

import jax
import jax.numpy as jnp
import optax


def warmup_linear(x, warmup=0.002):
    """Triangular schedule: peak 1.0 at x=warmup, zero at x=1
    (reference optimization.py:42-48)."""
    x = jnp.asarray(x, jnp.float32)
    w = jnp.float32(warmup)
    return jnp.where(x < w, x / w, jnp.maximum((x - 1.0) / (w - 1.0), 0.0))


def warmup_cosine(x, warmup=0.002):
    """(reference optimization.py:27-30)"""
    x = jnp.asarray(x, jnp.float32)
    w = jnp.float32(warmup)
    return jnp.where(x < w, x / w, 0.5 * (1.0 + jnp.cos(jnp.pi * x)))


def warmup_constant(x, warmup=0.002):
    """(reference optimization.py:33-38)"""
    x = jnp.asarray(x, jnp.float32)
    w = jnp.float32(warmup)
    return jnp.where(x < w, x / w, 1.0)


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
}


class BertAdamState(NamedTuple):
    count: jax.Array  # int32 global update counter (for logging/bookkeeping)
    m: Any
    v: Any
    # per-leaf scalar int32 counters + bool activation flags (reference
    # optimization.py:130-142,195: per-param state['step'], None-grad skip)
    leaf_count: Any = None
    active: Any = None


class FusedGradientTransformation(NamedTuple):
    """optax GradientTransformation + a fused clip-update-apply fast path
    (consumed by training/steps._clip_update_apply)."""

    init: Callable
    update: Callable
    fused_step: Callable  # (grads, state, params, clip) -> (params, state)


def bert_adam(lr: float,
              warmup: float = -1.0,
              t_total: int = -1,
              schedule: str = "warmup_linear",
              b1: float = 0.9,
              b2: float = 0.999,
              eps: float = 1e-6,
              weight_decay: float = 0.01,
              lr_scale: Optional[Any] = None,
              fused: bool = False,
              flat: bool = False,
              jnp_fused: bool = False) -> optax.GradientTransformation:
    """Adam-without-bias-correction with scheduled lr and decoupled wd.

    Args:
      lr: base learning rate (the reference passes 4*args.lr here and scales
        the encoder group down; equivalently pass args.lr and lr_scale=4 on
        downstream leaves - both supported via `lr_scale`).
      warmup: warmup fraction of t_total (-1 disables the schedule).
      t_total: total scheduled steps. NOTE the reference steps the optimizer
        TWICE per batch, hence its `t_total = 2 * epochs * steps_per_epoch`
        (gqa_ood.py:133-137).
      lr_scale: optional pytree (prefix-broadcastable to params) of scalar lr
        multipliers per leaf.
    """
    if schedule not in SCHEDULES:
        raise ValueError(f"unknown schedule {schedule!r}")
    if flat:
        # single-buffer state, one fused HBM pass per update (see below)
        return flat_bert_adam(lr=lr, warmup=warmup, t_total=t_total,
                              schedule=schedule, b1=b1, b2=b2, eps=eps,
                              weight_decay=weight_decay, lr_scale=lr_scale)
    sched_fn = SCHEDULES[schedule]

    def init_fn(params):
        return BertAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
            leaf_count=jax.tree.map(
                lambda _: jnp.zeros((), jnp.int32), params),
            active=jax.tree.map(
                lambda _: jnp.zeros((), jnp.bool_), params),
        )

    def leaf_lr(cnt):
        if t_total != -1 and warmup != -1:
            progress = cnt.astype(jnp.float32) / float(t_total)
            return lr * sched_fn(progress, warmup)
        return jnp.float32(lr)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("bert_adam requires params (decoupled weight decay)")
        # lazy per-leaf activation: skipped until the first nonzero gradient
        # (reference optimization.py:130 `if p.grad is None: continue` +
        # torch 1.7.1 zero_grad() keeping zeroed tensors afterwards)
        active = jax.tree.map(lambda a, g: a | jnp.any(g != 0),
                              state.active, grads)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1.0 - b1) * g,
                         state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1.0 - b2) * g * g,
                         state.v, grads)

        def make_update(mm, vv, p, cnt, a, scale):
            u = mm / (jnp.sqrt(vv) + eps)
            if weight_decay > 0.0:
                u = u + weight_decay * p
            return jnp.where(a, -(leaf_lr(cnt) * scale) * u,
                             jnp.zeros_like(u))

        scales = lr_scale if lr_scale is not None \
            else jax.tree.map(lambda _: 1.0, params)
        updates = jax.tree.map(make_update, m, v, params, state.leaf_count,
                               active, scales)
        # inactive leaves keep zero moments (m = b1*0 + 0) so no masking is
        # needed for m/v; counters advance only while active
        leaf_count = jax.tree.map(
            lambda c, a: c + a.astype(jnp.int32), state.leaf_count, active)
        return updates, BertAdamState(count=state.count + 1, m=m, v=v,
                                      leaf_count=leaf_count, active=active)

    if fused:
        return FusedGradientTransformation(
            init_fn, update_fn,
            make_fused_bert_adam_step(
                lr=lr, warmup=warmup, t_total=t_total, schedule=schedule,
                b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                lr_scale=lr_scale))
    if jnp_fused:
        return FusedGradientTransformation(
            init_fn, update_fn,
            make_jnp_fused_step(
                lr=lr, warmup=warmup, t_total=t_total, schedule=schedule,
                b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                lr_scale=lr_scale))
    return optax.GradientTransformation(init_fn, update_fn)


def make_jnp_fused_step(lr: float,
                        warmup: float = -1.0,
                        t_total: int = -1,
                        schedule: str = "warmup_linear",
                        b1: float = 0.9,
                        b2: float = 0.999,
                        eps: float = 1e-6,
                        weight_decay: float = 0.01,
                        lr_scale: Optional[Any] = None) -> Callable:
    """Clip + BertAdam update + apply in ONE tree traversal, pure jnp.

    The three-stage tree path (scale grads -> update_fn's m/v/updates ->
    optax.apply_updates) materializes the scaled-grads and updates trees and
    leaves XLA with ~2-3 fusions per leaf; computing new params directly in
    one per-leaf expression gives XLA a single g,m,v,p -> m,v,p loop per
    leaf (the minimal HBM traffic) with no Pallas launch overhead.
    Numerically the same math in the same dtype; XLA fusion may FMA/reorder
    at the 1-ulp level.

    Returns step(grads, state, params, clip) -> (new_params, new_state).
    """
    sched_fn = SCHEDULES[schedule]

    def leaf_lr(cnt):
        if t_total != -1 and warmup != -1:
            progress = cnt.astype(jnp.float32) / float(t_total)
            return lr * sched_fn(progress, warmup)
        return jnp.float32(lr)

    def step(grads, state: BertAdamState, params, clip: float):
        gnorm = optax.global_norm(grads)
        clip_scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        active = jax.tree.map(lambda a, g: a | jnp.any(g != 0),
                              state.active, grads)
        scales = lr_scale if lr_scale is not None \
            else jax.tree.map(lambda _: 1.0, params)

        def leaf(g, m, v, p, cnt, a, s):
            g = g * clip_scale
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * g * g
            u = m2 / (jnp.sqrt(v2) + eps)
            if weight_decay > 0.0:
                u = u + weight_decay * p
            return m2, v2, p - jnp.where(a, leaf_lr(cnt) * s, 0.0) * u

        out = jax.tree.map(leaf, grads, state.m, state.v, params,
                           state.leaf_count, active, scales)
        outer = jax.tree.structure(params)
        inner = jax.tree.structure((0, 0, 0))
        m2, v2, p2 = jax.tree.transpose(outer, inner, out)
        leaf_count = jax.tree.map(
            lambda c, a: c + a.astype(jnp.int32), state.leaf_count, active)
        return p2, BertAdamState(count=state.count + 1, m=m2, v=v2,
                                 leaf_count=leaf_count, active=active)

    return step


def make_fused_bert_adam_step(lr: float,
                              warmup: float = -1.0,
                              t_total: int = -1,
                              schedule: str = "warmup_linear",
                              b1: float = 0.9,
                              b2: float = 0.999,
                              eps: float = 1e-6,
                              weight_decay: float = 0.01,
                              lr_scale: Optional[Any] = None) -> Callable:
    """Clip + BertAdam update + apply as ONE fused pass over HBM per leaf
    (Pallas kernel, ops/pallas_optim.py). Numerically identical to
    clip_by_global_norm + bert_adam().update + optax.apply_updates.

    Returns step(grads, state, params, clip) -> (new_params, new_state).
    """
    import optax

    from xggm_tpu.ops.pallas_optim import fused_adam_leaf

    sched_fn = SCHEDULES[schedule]

    def leaf_lr(cnt):
        if t_total != -1 and warmup != -1:
            progress = cnt.astype(jnp.float32) / float(t_total)
            return lr * sched_fn(progress, warmup)
        return jnp.float32(lr)

    def step(grads, state: BertAdamState, params, clip: float):
        gnorm = optax.global_norm(grads)
        clip_scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        active = jax.tree.map(lambda a, g: a | jnp.any(g != 0),
                              state.active, grads)
        scales = lr_scale if lr_scale is not None \
            else jax.tree.map(lambda _: 1.0, params)

        treedef = jax.tree.structure(params)
        flat = lambda t: treedef.flatten_up_to(t)  # noqa: E731
        new_m, new_v, new_p = [], [], []
        for g, mm, vv, p, cnt, a, scale in zip(
                flat(grads), flat(state.m), flat(state.v), flat(params),
                flat(state.leaf_count), flat(active), flat(scales)):
            lr_eff = jnp.where(a, leaf_lr(cnt) * scale, 0.0)
            mo, vo, po = fused_adam_leaf(
                g, mm, vv, p, clip_scale, lr_eff,
                b1=b1, b2=b2, eps=eps, wd=weight_decay)
            new_m.append(mo)
            new_v.append(vo)
            new_p.append(po)
        unflat = treedef.unflatten
        leaf_count = jax.tree.map(
            lambda c, x: c + x.astype(jnp.int32), state.leaf_count, active)
        new_state = BertAdamState(
            count=state.count + 1, m=unflat(new_m), v=unflat(new_v),
            leaf_count=leaf_count, active=active)
        return unflat(new_p), new_state

    return step


# ---------------------------------------------------------------------------
# Flat-state BertAdam: identical math, single-buffer state.
# EXPLORED AND REJECTED as the default — kept tested as the record.
#
# Motivation: the tree update touches 132 separate leaves -> XLA emits ~132
# small fused loops per optimizer step and the step costs ~13 ms on v5e at
# bs 96 where the pure HBM bandwidth bound is ~4 ms. Here m, v and a master
# copy of the params live as single [num_blocks, 1024] fp32 buffers (each
# leaf padded to a 1024-element multiple so no block straddles two leaves);
# the update itself is ONE fused elementwise pass, with the per-leaf
# scheduled lr / activation mask applied through a [num_blocks] vector
# broadcast. Per-leaf lazy activation and counters (the reference's
# per-param semantics, optimization.py:130-142) are kept as [L] vectors.
#
# Measured on v5e (tools/perf_probe.py --flat, bs 96): opt_only 24.5 ms vs
# 13.0 ms for the tree path; full step 112.6 vs 92.8 ms. The grads-concat
# and params-slice-out copies XLA materializes around the flat buffers cost
# ~2x what the per-leaf launch overhead did. Fixing this at the root needs
# fewer, bigger leaves (scan-over-layers stacked params), not a flat view.
#
# Also single-chip only: the flat buffers cannot follow per-leaf
# tensor-parallel shardings.
# ---------------------------------------------------------------------------

_FLAT_PAD = 1024  # 8 sublanes x 128 lanes


class FlatBertAdamState(NamedTuple):
    count: jax.Array       # int32 global update counter
    m: jax.Array           # [NB, _FLAT_PAD] fp32
    v: jax.Array           # [NB, _FLAT_PAD] fp32
    p: jax.Array           # [NB, _FLAT_PAD] fp32 master params
    leaf_count: jax.Array  # [L] int32 per-leaf step counters
    active: jax.Array      # [L] bool lazy-activation flags


class _FlatLayout(NamedTuple):
    treedef: Any
    shapes: tuple
    dtypes: tuple
    sizes: tuple        # unpadded element counts
    blocks: tuple       # blocks per leaf
    block_starts: tuple  # first block index per leaf
    n_blocks: int
    block2leaf: jax.Array  # [NB] int32


def _flat_layout(params) -> _FlatLayout:
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes, dtypes, sizes, blocks = [], [], [], []
    for leaf in leaves:
        assert leaf.dtype == jnp.float32, (
            f"flat bert_adam expects fp32 params, got {leaf.dtype}")
        shapes.append(tuple(leaf.shape))
        dtypes.append(leaf.dtype)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        sizes.append(n)
        blocks.append(-(-n // _FLAT_PAD))
    starts = np.concatenate([[0], np.cumsum(blocks)[:-1]]).astype(np.int32)
    nb = int(np.sum(blocks))
    block2leaf = jnp.asarray(np.repeat(np.arange(len(leaves), dtype=np.int32),
                                       blocks))
    return _FlatLayout(treedef, tuple(shapes), tuple(dtypes), tuple(sizes),
                       tuple(blocks), tuple(int(s) for s in starts), nb,
                       block2leaf)


def _flatten_tree(layout: _FlatLayout, tree) -> jax.Array:
    """Concat the tree's leaves (ravel + zero-pad to block multiples) into
    one [NB, _FLAT_PAD] buffer."""
    leaves = layout.treedef.flatten_up_to(tree)
    parts = []
    for leaf, size, nblk in zip(leaves, layout.sizes, layout.blocks):
        flat = jnp.ravel(leaf)
        pad = nblk * _FLAT_PAD - size
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        parts.append(flat.reshape(nblk, _FLAT_PAD))
    return jnp.concatenate(parts, axis=0)


def _unflatten_tree(layout: _FlatLayout, buf: jax.Array):
    """Slice the [NB, _FLAT_PAD] buffer back into the original leaves."""
    leaves = []
    for shape, size, nblk, start in zip(layout.shapes, layout.sizes,
                                        layout.blocks, layout.block_starts):
        flat = buf[start:start + nblk].reshape(-1)[:size]
        leaves.append(flat.reshape(shape))
    return jax.tree_util.tree_unflatten(layout.treedef, leaves)


def flat_bert_adam(lr: float,
                   warmup: float = -1.0,
                   t_total: int = -1,
                   schedule: str = "warmup_linear",
                   b1: float = 0.9,
                   b2: float = 0.999,
                   eps: float = 1e-6,
                   weight_decay: float = 0.01,
                   lr_scale: Optional[Any] = None) -> Any:
    """bert_adam with flat single-buffer state (same update math, one fused
    HBM pass). Exposes the `fused_step` protocol consumed by
    training/steps._clip_update_apply; `update` is not implemented (the flat
    state only supports the fused clip+update+apply path)."""
    if schedule not in SCHEDULES:
        raise ValueError(f"unknown schedule {schedule!r}")
    sched_fn = SCHEDULES[schedule]
    layout_box = {}

    def _layout_for(params) -> _FlatLayout:
        if "layout" not in layout_box:
            layout_box["layout"] = _flat_layout(params)
        return layout_box["layout"]

    def init_fn(params):
        layout = _layout_for(params)
        p_flat = _flatten_tree(layout, params)
        L = len(layout.shapes)
        return FlatBertAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(p_flat),
            v=jnp.zeros_like(p_flat),
            p=p_flat,
            leaf_count=jnp.zeros((L,), jnp.int32),
            active=jnp.zeros((L,), jnp.bool_),
        )

    def leaf_lr_vec(cnt_vec):
        if t_total != -1 and warmup != -1:
            progress = cnt_vec.astype(jnp.float32) / float(t_total)
            return lr * sched_fn(progress, warmup)
        return jnp.full_like(cnt_vec, lr, jnp.float32)

    def fused_step(grads, state: FlatBertAdamState, params, clip: float):
        layout = _layout_for(params)
        g_leaves = layout.treedef.flatten_up_to(grads)
        # global-norm clip, identical reduction order to optax.global_norm
        gnorm = optax.global_norm(grads)
        clip_scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))

        active = state.active | jnp.stack(
            [jnp.any(g != 0) for g in g_leaves])
        if lr_scale is not None:
            import numpy as np
            scale_vec = jnp.asarray(np.asarray(
                [float(s) for s in layout.treedef.flatten_up_to(lr_scale)],
                np.float32))
        else:
            scale_vec = jnp.ones((len(g_leaves),), jnp.float32)
        lr_leaf = jnp.where(active, leaf_lr_vec(state.leaf_count) * scale_vec,
                            0.0)
        lr_block = lr_leaf[layout.block2leaf]          # [NB]

        g = _flatten_tree(layout, grads) * clip_scale  # [NB, _FLAT_PAD]
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * g * g
        u = m / (jnp.sqrt(v) + eps)
        if weight_decay > 0.0:
            u = u + weight_decay * state.p
        p = state.p - lr_block[:, None] * u

        leaf_count = state.leaf_count + active.astype(jnp.int32)
        new_state = FlatBertAdamState(
            count=state.count + 1, m=m, v=v, p=p,
            leaf_count=leaf_count, active=active)
        return _unflatten_tree(layout, p), new_state

    def update_fn(grads, state, params=None):
        raise NotImplementedError(
            "flat_bert_adam only supports the fused clip+update+apply path")

    return FusedGradientTransformation(init_fn, update_fn, fused_step)


def lr_scale_tree(params: Any, predicate: Callable[[str], bool],
                  scale_true: float, scale_false: float) -> Any:
    """Build an lr_scale pytree: leaves whose '/'-joined path satisfies
    `predicate` get `scale_true`, others `scale_false`.

    Mirrors the reference's two param groups (downstream at 4x lr, encoder at
    1x - src/gqa/gqa_ood.py:122-133) when called with
    predicate=lambda p: not p.startswith('lxrt')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    scales = []
    for path, _ in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        scales.append(scale_true if predicate(name) else scale_false)
    return jax.tree_util.tree_unflatten(treedef, scales)
