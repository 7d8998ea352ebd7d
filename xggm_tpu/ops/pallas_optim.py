"""Fused BertAdam update kernel (Pallas).

The XLA lowering of clip -> moment update -> update -> apply makes ~13 ms
per update at the flagship scale (210M fp32 params): the grads are read for
the global norm, then the m/v/p buffers are traversed in several separate
passes. This kernel performs the whole per-leaf update in ONE pass over
HBM - read (g, m, v, p), write (m', v', p') - with the clip scale and the
leaf's effective learning rate prefetched as scalars:

    g'  = g * clip_scale
    m'  = b1 * m + (1-b1) * g'
    v'  = b2 * v + (1-b2) * g'^2
    p'  = p - lr_eff * (m'/(sqrt(v')+eps) + wd * p)

lr_eff folds the BertAdam schedule, the per-leaf lr scale, and the lazy
per-leaf activation (lr_eff = 0 leaves p untouched; m/v stay zero because
inactive leaves have zero grads) - numerics identical to
training/bert_adam.py, asserted by tests/test_fused_optim.py.

Reference behavioral anchor: src/lxrt/optimization.py:126-203.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# 0.5 MB per fp32 buffer: 7 buffers x 2 (pipeline double-buffering) = 7 MB,
# comfortably inside the ~16 MB VMEM scoped limit
_TARGET_BLOCK_ELEMS = 128 * 1024


def _adam_kernel(sc_ref, g_ref, m_ref, v_ref, p_ref,
                 mo_ref, vo_ref, po_ref, *, b1, b2, eps, wd):
    gs = g_ref[:] * sc_ref[0]
    m = b1 * m_ref[:] + (1.0 - b1) * gs
    v = b2 * v_ref[:] + (1.0 - b2) * gs * gs
    u = m / (jnp.sqrt(v) + eps)
    if wd > 0.0:
        u = u + wd * p_ref[:]
    po_ref[:] = p_ref[:] - sc_ref[1] * u
    mo_ref[:] = m
    vo_ref[:] = v


def fused_adam_leaf(g: Array, m: Array, v: Array, p: Array,
                    clip_scale: Array, lr_eff: Array,
                    *, b1: float, b2: float, eps: float, wd: float):
    """Single-pass BertAdam update for one parameter leaf.

    clip_scale, lr_eff: traced fp32 scalars. Returns (m', v', p').
    """
    shape, dtype = p.shape, p.dtype
    # normalize to 2D [rows, cols]: TPU wants >=2D refs; elementwise math is
    # layout-agnostic so reshape is free (same contiguous layout)
    if p.ndim == 0:
        rows, cols = 1, 1
    elif p.ndim == 1:
        rows, cols = 1, shape[0]
    else:
        cols = shape[-1]
        rows = p.size // cols
    g2, m2, v2, p2 = (x.reshape(rows, cols) for x in (g, m, v, p))

    row_block = max(1, min(rows, _TARGET_BLOCK_ELEMS // max(cols, 1)))
    if row_block != rows:
        # TPU lowering: block rows must be a multiple of 8 unless the block
        # spans the whole array dimension
        row_block = max(8, (row_block // 8) * 8)
    grid = ((rows + row_block - 1) // row_block,)
    spec = pl.BlockSpec((row_block, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    scalars = jnp.stack([clip_scale.astype(jnp.float32),
                         lr_eff.astype(jnp.float32)])
    mo, vo, po = pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        out_shape=[jax.ShapeDtypeStruct((rows, cols), dtype)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec, spec],
        input_output_aliases={2: 0, 3: 1, 4: 2},  # m, v, p update in place
        interpret=jax.default_backend() != "tpu",
    )(scalars, g2, m2, v2, p2)
    return mo.reshape(shape), vo.reshape(shape), po.reshape(shape)
