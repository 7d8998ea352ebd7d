"""Int8 inference quantization for exported serving artifacts.

TPU v5e's MXU runs int8xint8->int32 matmuls at twice the bf16 rate, and
int8 weights halve the weight-read bandwidth again vs bf16. This module
implements the standard BERT post-training-quantization recipe on the
serving path only (training is untouched):

- **weights**: symmetric per-output-channel int8 (scale = max|W[:, o]|/127),
  quantized once at export time and stored as int8 in the artifact;
- **activations**: symmetric dynamic per-row int8 (scale computed from each
  row's max at run time) - no calibration data needed, and the reduction
  fuses into the preceding elementwise ops on TPU;
- the int32 accumulator is rescaled by (a_scale * w_scale) in fp32, then
  bias is added - matching nn.Dense's y = x @ W + b up to quantization
  rounding.

Only `nn.Dense` projections/FFNs are quantized (the GEMMs that carry the
FLOPs); attention score/context matmuls, LayerNorms, embeddings and the
final answer projection stay in the model's compute dtype, mirroring
standard int8 BERT deployments. Integration is an export-time
`flax.linen.intercept_methods` hook - no model-code changes, and the
loaded artifact stays model-code-free (the int8 ops live in the exported
StableHLO graph).

The reference has no quantized deployment story (its test arm runs the
fp32 torch model, src/gqa/gqa_ood.py:379-396); this is TPU-side extra
capability. Opt-in via export_model(..., quantize="int8") /
`xggm-export --quantize int8`.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# The final answer projection (logits layer) keeps full precision - the
# standard PTQ exclusion: its output feeds argmax directly with no
# LayerNorm to absorb quantization noise.
DEFAULT_EXCLUDE = (r"(^|/)fc2$",)

_SCALE_KEY = "kernel_scale_int8"


def quantize_kernel(w: np.ndarray):
    """Symmetric per-output-channel int8: w [in, out] -> (int8 w_q, fp32
    scale [out]) with w ~= w_q * scale."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.max(np.abs(w), axis=0)
    scale = np.maximum(amax, 1e-8) / 127.0
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return w_q, scale.astype(np.float32)


def quantize_dense_params(params, exclude: Sequence[str] = DEFAULT_EXCLUDE):
    """Replace every 2-D Dense `kernel` in the tree (except paths matching
    `exclude` regexes) with its int8 quantization + a `kernel_scale_int8`
    sibling leaf. Returns (new_params, n_quantized)."""
    patterns = [re.compile(p) for p in exclude]

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, child in node.items():
            out[key] = walk(child, path + "/" + key if path else key)
        kern = out.get("kernel")
        if (isinstance(kern, (np.ndarray, jax.Array))
                and getattr(kern, "ndim", 0) == 2
                and kern.dtype in (np.float32, jnp.bfloat16)
                and not any(p.search(path) for p in patterns)):
            w_q, scale = quantize_kernel(kern)
            out["kernel"] = w_q
            out[_SCALE_KEY] = scale
            walk.count += 1
        return out

    walk.count = 0
    new = walk(params, "")
    return new, walk.count


def _dynamic_act_quant(x):
    """Per-row symmetric int8: returns (int8 x_q, fp32 scale [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense_interceptor(next_fun, args, kwargs, context):
    """flax intercept hook: Dense modules whose params carry an int8 kernel
    run the quantized GEMM; everything else passes through."""
    mod = context.module
    if not (isinstance(mod, nn.Dense) and context.method_name == "__call__"):
        return next_fun(*args, **kwargs)
    variables = mod.variables.get("params", {})
    if _SCALE_KEY not in variables:
        return next_fun(*args, **kwargs)
    w_q = variables["kernel"]
    w_scale = variables[_SCALE_KEY]
    (x,) = args
    x_q, a_scale = _dynamic_act_quant(x)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_scale * w_scale[None, :])
    if mod.use_bias:
        y = y + variables["bias"].astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


def intercepted_apply(model, params, *args, **kwargs):
    """model.apply with the int8 Dense hook active (used at export trace
    time; the resulting StableHLO needs no flax at load time)."""
    with nn.intercept_methods(int8_dense_interceptor):
        return model.apply(params, *args, **kwargs)
