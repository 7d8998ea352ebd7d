"""Pallas fused attention for LXMERT's tiny-sequence regime.

At LXMERT shapes (Lq, Lk <= 56, D=64, H=12, large batch) attention is
bandwidth-bound, not FLOP-bound: XLA materializes the [B, H, Lq, Lk] score
and probability tensors in HBM between the three ops. This kernel performs
score -> +bias -> softmax -> @V in ONE pass over VMEM per (batch*head)
group - the probability tensor never touches HBM.

Layout: the caller flattens (B, H) into the leading axis. The grid tiles
that axis; each program holds G groups' q/k/v blocks in VMEM and runs a
G-batched dot_general (the G axis supplies MXU work that the tiny Lq/Lk
cannot).

Exposed as `fused_attention(q, k, v, bias)` with a custom VJP whose backward
recomputes probabilities in plain XLA (flash-attention-style rematerialize):
forward gets the fused win, gradients stay exact.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[:]                        # [G, Lq, D]
    k = k_ref[:]                        # [G, Lk, D]
    v = v_ref[:]                        # [G, Lk, D]
    bias = bias_ref[:]                  # [G, Lk] additive (0 / -10000)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [G, Lq, Lk]
    s = s * scale + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [G, Lq, D]
    o_ref[:] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q: Array, k: Array, v: Array, bias: Array,
                              group: int = 16) -> Array:
    """q [BH, Lq, D], k/v [BH, Lk, D], bias [BH, Lk] -> [BH, Lq, D]."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    g = min(group, bh)
    while bh % g:
        g -= 1
    grid = (bh // g,)

    return pl.pallas_call(
        functools.partial(_attention_kernel, scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, lq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(q, k, v, bias)


def _reference_attention(q, k, v, bias):
    s = jnp.einsum("gqd,gkd->gqk", q, k, preferred_element_type=jnp.float32)
    s = s / (q.shape[-1] ** 0.5) + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gqk,gkd->gqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype), p


@jax.custom_vjp
def fused_attention(q: Array, k: Array, v: Array, bias: Array) -> Array:
    """Fused softmax attention over flattened (batch*head) groups."""
    return _fused_attention_fwd_impl(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _fused_attention_fwd_impl(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g_out):
    q, k, v, bias = res
    # rematerialize probabilities in plain XLA; gradients are exact
    _, p = _reference_attention(q, k, v, bias)
    g_out32 = g_out.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    dv = jnp.einsum("gqk,gqd->gkd", p32, g_out32)
    dp = jnp.einsum("gqd,gkd->gqk", g_out32, v.astype(jnp.float32))
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    scale = 1.0 / (q.shape[-1] ** 0.5)
    dq = jnp.einsum("gqk,gkd->gqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("gqk,gqd->gkd", ds, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


fused_attention.defvjp(_fwd, _bwd)


def mha_pallas(q: Array, k: Array, v: Array,
               attn_bias: Optional[Array]) -> Array:
    """Drop-in for the [B, H, L, D] einsum attention path.

    attn_bias: [B, 1, 1, Lk] additive mask or None."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    if attn_bias is None:
        bias = jnp.zeros((b * h, lk), jnp.float32)
    else:
        bias = jnp.broadcast_to(attn_bias[:, 0, 0, :][:, None, :],
                                (b, h, lk)).reshape(b * h, lk)
    out = fused_attention(qf, kf, vf, bias.astype(jnp.float32))
    return out.reshape(b, h, lq, d)
