"""BertAdam as an optax gradient transformation.

Behavioral spec from reference src/lxrt/optimization.py:27-203, reproduced
exactly - including the quirks that silently change training dynamics:

* NO bias correction (optimization.py:195-201): update = m/(sqrt(v)+eps).
* Decoupled weight decay applied to EVERY parameter (the reference trainers
  never build no-decay groups): update += wd * p (optimization.py:170-171).
* Per-step scheduled lr with `progress = step / t_total` evaluated BEFORE the
  step counter increments (optimization.py:176-195) - so the very first
  optimizer step applies lr = 0 under warmup schedules.
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
    count: jax.Array  # int32 step counter (pre-increment at lr eval)
    m: Any
    v: Any


def bert_adam(lr: float,
              warmup: float = -1.0,
              t_total: int = -1,
              schedule: str = "warmup_linear",
              b1: float = 0.9,
              b2: float = 0.999,
              eps: float = 1e-6,
              weight_decay: float = 0.01,
              lr_scale: Optional[Any] = None) -> optax.GradientTransformation:
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
    sched_fn = SCHEDULES[schedule]

    def init_fn(params):
        return BertAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("bert_adam requires params (decoupled weight decay)")
        m = jax.tree.map(lambda mm, g: b1 * mm + (1.0 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1.0 - b2) * g * g,
                         state.v, grads)

        if t_total != -1 and warmup != -1:
            progress = state.count.astype(jnp.float32) / float(t_total)
            lr_t = lr * sched_fn(progress, warmup)
        else:
            lr_t = jnp.float32(lr)

        def make_update(mm, vv, p, scale):
            u = mm / (jnp.sqrt(vv) + eps)
            if weight_decay > 0.0:
                u = u + weight_decay * p
            return -(lr_t * scale) * u

        if lr_scale is None:
            updates = jax.tree.map(
                lambda mm, vv, p: make_update(mm, vv, p, 1.0), m, v, params)
        else:
            updates = jax.tree.map(make_update, m, v, params, lr_scale)

        return updates, BertAdamState(count=state.count + 1, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


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
