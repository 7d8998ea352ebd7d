"""Jitted train/eval steps for the X-GGM trainers.

Structure mirrors the reference batch loop (SURVEY.md §3.1-3.2,
reference src/gqa/gqa_ood.py:151-289 / src/vqa/vqacpv2.py:151-254):

  per batch:  [GGM phase] one of two branches, chosen on HOST by
              randint(1,10) <= delta       -> backward -> clip 5.0 -> step
              [CLEAN phase] plain BCE      -> backward -> clip 5.0 -> step

i.e. TWO optimizer steps per batch with a shared schedule counter (which is
why t_total = 2x the batch count). The host-side branch draw selects between
two separately-compiled step functions - no data-dependent control flow ever
enters the traced graph.

GQA runs GGM-then-clean, VQA-CP runs clean-then-GGM
(cfg.clean_phase_first); the loss multipliers differ per task (TrainConfig).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from xggm_tpu.config import TrainConfig
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.ops.losses import bce_with_logits, symmetric_kl, score_matching_loss

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    # Optional bf16 working copies of the bf16-consumed leaves of `params`
    # (bf16_param_shadow, a flat {path: leaf} dict): when present, train
    # steps run fwd/bwd from masters-with-shadow-overlaid (_apply_params) -
    # the GEMMs read half the weight bytes - and refresh the shadow after
    # each optimizer update. Only leaves the model itself casts to bf16 at
    # use are shadowed, so by construction the operands entering every op
    # are the same bf16 values; in practice XLA's excess-precision folding
    # (on by default) may elide the fp32->bf16 convert in the MASTER graph
    # and carry extra precision through some fused ops, so the two paths
    # agree at bf16 rounding level rather than bit-exactly
    # (tests/test_bf16_shadow.py pins the envelope). `params` stays the fp32
    # master the optimizer updates. Holding ONLY the cast leaves (not the
    # fp32 passthroughs) keeps the state alias-free for donate_argnums.
    params_bf16: Any = None


# Parent-module markers for params consumed in float32 (LayerNormBase
# computes in fp32; ops/basic.py). Leaf names 'scale' (LayerNorm) and
# 'embedding' (nn.Embed tables, gathered then LayerNormed in fp32) are
# excluded by the kernel/bias allowlist below.
_LN_MARKERS = ("layernorm", "layer_norm")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _bf16_consumed(path) -> bool:
    """True iff the model casts this param to bf16 at its point of use
    (nn.Dense kernels/biases built via ops.basic.dense with dtype=bf16)."""
    keys = [str(getattr(k, "key", k)) for k in path]
    if keys[-1] not in ("kernel", "bias"):
        return False
    parent = keys[-2].lower() if len(keys) > 1 else ""
    return not any(m in parent for m in _LN_MARKERS)


def bf16_param_shadow(params):
    """Flat {path: leaf} dict of bf16 copies of ONLY the bf16-consumed
    leaves. fp32-consumed leaves (LayerNorm, embedding tables) are absent -
    _apply_params reads them from the masters - so the shadow never aliases
    a master buffer (donate_argnums would reject donating a buffer twice)."""
    return {_path_str(path): p.astype(jnp.bfloat16)
            for path, p in jax.tree_util.tree_leaves_with_path(params)
            if p.dtype == jnp.float32 and _bf16_consumed(path)}


def _upcast_grads(grads):
    """bf16 cotangents -> fp32 for the optimizer: the same upcast the
    fp32-param graph performs inside the cast VJP."""
    return jax.tree.map(
        lambda g: g.astype(jnp.float32) if g.dtype == jnp.bfloat16 else g,
        grads)


def _apply_params(state: TrainState):
    """Param tree the fwd/bwd runs from: masters with the bf16 shadow
    overlaid (leaves not in the shadow come straight from the masters)."""
    if state.params_bf16 is None:
        return state.params
    shadow = state.params_bf16
    return jax.tree_util.tree_map_with_path(
        lambda path, p: shadow.get(_path_str(path), p), state.params)


def _clip_update_apply(tx, grads, state: TrainState, clip: float) -> TrainState:
    """External global-norm clip (reference gqa_ood.py:230: clip_grad_norm 5.0)
    then one optimizer step. A transform exposing `fused_step` (the Pallas
    single-pass BertAdam, training/bert_adam.py) performs clip+update+apply
    in one traversal of HBM."""
    if state.params_bf16 is not None:
        grads = _upcast_grads(grads)
    fused = getattr(tx, "fused_step", None)
    if fused is not None:
        params, opt_state = fused(grads, state.opt_state, state.params, clip)
    else:
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
    shadow = None if state.params_bf16 is None else bf16_param_shadow(params)
    return TrainState(params, opt_state, shadow)


def _batch_args(batch: Dict[str, Array]) -> Tuple[Array, ...]:
    return (batch["input_ids"], batch["input_mask"], batch["segment_ids"],
            batch["feats"], batch["boxes"])


def _constrain_state(state: TrainState, shardings) -> TrainState:
    """Pin the post-update TrainState to its ZeRO layout
    (parallel/mesh.zero_state_shardings): sharded m/v/masters stay sharded
    across steps, and the refreshed bf16 shadow is gathered back to its
    replicated/TP layout ONCE here (the all-gather of ZeRO-1) instead of
    per-use in the next phase's forward."""
    if shardings is None:
        return state
    return jax.tree.map(jax.lax.with_sharding_constraint, state, shardings)


def make_ggm_train_step(model: XGGMModel, tx, cfg: TrainConfig,
                        branch: str, state_shardings=None) -> Callable:
    """Build one fused (GGM phase + clean phase) train step for `branch` in
    {'relation', 'representation'}.

    state_shardings: optional TrainState-shaped pytree of NamedShardings
    (parallel/mesh.zero_state_shardings) pinning the ZeRO optimizer-state
    layout through the step."""
    assert branch in ("relation", "representation")
    num_ans = model.num_answers
    sigma = model.ggm.sigma

    def ggm_loss(params, batch, dropout_key, noise_key):
        # trajectory-parity tests replay reference-drawn noise via an
        # optional batch entry; absent in real training
        noise_override = batch.get("noise_override")
        if branch == "relation":
            logits, adj_gen, grad_log, adj_true = model.apply(
                params, *_batch_args(batch), batch["adj"], noise_key,
                deterministic=False, rngs={"dropout": dropout_key},
                noise_override=noise_override,
                method=XGGMModel.relation_branch)
            # reference gqa_ood.py:192-197 / vqacpv2.py:208-212
            d_loss = symmetric_kl(adj_gen, adj_true) * num_ans
            loss_grad = score_matching_loss(adj_gen, grad_log, sigma)
            loss_sm = cfg.rel_d_mult * d_loss + loss_grad
            sm_mult = cfg.rel_sm_mult
        else:
            logits, node_gen, feat_grad, visn = model.apply(
                params, *_batch_args(batch), batch["adj"], noise_key,
                deterministic=False, rngs={"dropout": dropout_key},
                noise_override=noise_override,
                method=XGGMModel.representation_branch)
            # reference gqa_ood.py:241-246
            d_loss = symmetric_kl(node_gen, visn) * num_ans
            loss_grad = score_matching_loss(node_gen, feat_grad, sigma)
            loss_sm = cfg.rep_d_mult * d_loss + cfg.rep_grad_mult * loss_grad
            sm_mult = cfg.rep_sm_mult
        bce = bce_with_logits(logits, batch["target"]) * num_ans
        loss = bce + sm_mult * loss_sm
        return loss, {"ggm_bce": bce, "d_loss": d_loss,
                      "loss_grad": loss_grad, "loss_sm": loss_sm}

    def clean_loss(params, batch, dropout_key):
        logits = model.apply(
            params, *_batch_args(batch), deterministic=False,
            rngs={"dropout": dropout_key}, method=XGGMModel.clean_forward)
        loss = bce_with_logits(logits, batch["target"]) * num_ans
        return loss, logits

    def ggm_phase(state, batch, key):
        dk, nk = jax.random.split(key)
        (loss, aux), grads = jax.value_and_grad(ggm_loss, has_aux=True)(
            _apply_params(state), batch, dk, nk)
        state = _clip_update_apply(tx, grads, state, cfg.grad_clip)
        state = _constrain_state(state, state_shardings)
        aux["ggm_loss"] = loss
        return state, aux

    def clean_phase(state, batch, key):
        (loss, logits), grads = jax.value_and_grad(clean_loss, has_aux=True)(
            _apply_params(state), batch, key)
        state = _clip_update_apply(tx, grads, state, cfg.grad_clip)
        state = _constrain_state(state, state_shardings)
        return state, {"clean_loss": loss,
                       "preds": jnp.argmax(logits, axis=-1)}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, Array], key: Array):
        kg, kc = jax.random.split(key)
        metrics: Dict[str, Array] = {}
        if cfg.clean_phase_first:  # VQA-CP ordering (vqacpv2.py:170-254)
            state, m2 = clean_phase(state, batch, kc)
            state, m1 = ggm_phase(state, batch, kg)
        else:  # GQA ordering (gqa_ood.py:172-289)
            state, m1 = ggm_phase(state, batch, kg)
            state, m2 = clean_phase(state, batch, kc)
        metrics.update(m1)
        metrics.update(m2)
        return state, metrics

    return step


def make_clean_train_step(model, tx, cfg: TrainConfig,
                          num_answers: int, state_shardings=None) -> Callable:
    """Plain BCE fine-tuning step (reference src/vqa/vqacpv2_baseline.py:
    152-240): one forward, one optimizer step per batch."""

    def loss_fn(params, batch, dropout_key):
        if isinstance(model, XGGMModel):
            logits = model.apply(
                params, *_batch_args(batch), deterministic=False,
                rngs={"dropout": dropout_key}, method=XGGMModel.clean_forward)
        else:
            logits = model.apply(
                params, *_batch_args(batch), deterministic=False,
                rngs={"dropout": dropout_key})
        loss = bce_with_logits(logits, batch["target"]) * num_answers
        return loss, logits

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict[str, Array], key: Array):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            _apply_params(state), batch, key)
        state = _clip_update_apply(tx, grads, state, cfg.grad_clip)
        state = _constrain_state(state, state_shardings)
        return state, {"clean_loss": loss,
                       "preds": jnp.argmax(logits, axis=-1)}

    return step


def make_eval_step(model) -> Callable:
    """No-grad prediction: encoder + answer head only - the GGM branch is
    entirely absent at inference (reference gqa_ood.py:379-403)."""

    @jax.jit
    def step(params, batch: Dict[str, Array]) -> Array:
        if isinstance(model, XGGMModel):
            logits = model.apply(params, *_batch_args(batch),
                                 deterministic=True,
                                 method=XGGMModel.clean_forward)
        else:
            logits = model.apply(params, *_batch_args(batch),
                                 deterministic=True)
        return jnp.argmax(logits, axis=-1)

    return step


def make_logits_step(model) -> Callable:
    """Full logits (for parity tests / score dumps)."""

    @jax.jit
    def step(params, batch: Dict[str, Array]) -> Array:
        if isinstance(model, XGGMModel):
            return model.apply(params, *_batch_args(batch),
                               deterministic=True,
                               method=XGGMModel.clean_forward)
        return model.apply(params, *_batch_args(batch), deterministic=True)

    return step
