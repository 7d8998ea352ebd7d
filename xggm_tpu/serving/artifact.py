"""AOT model artifacts: export the inference graph with `jax.export`.

An artifact directory is fully self-contained:

    predict.stablehlo   serialized jax.export.Exported (the compiled-once
                        inference graph; multi-platform by default, so the
                        same artifact runs on TPU in production and on CPU
                        in CI)
    params.npz          weights, flat {'/'-joined path: array}; bfloat16
                        leaves stored as uint16 views (npz cannot carry
                        bf16) with their true dtypes recorded in meta.json
    meta.json           answer vocabulary, input shapes/dtypes, version

Loading requires xggm_tpu.serving + numpy + jax only - no flax, no model
code, no training stack. This replaces the reference's deploy story of
"ship the repo and run gqa_ood.py --test" (src/gqa/gqa_ood.py:379-403)
with the XLA-native compile-once/serve-many pattern.

By default weights are exported the way `trainer.predict` reads them: the
bf16-consumed Dense kernels/biases in bfloat16 (the bf16 param shadow,
training/steps.py), LayerNorm/embeddings in fp32 - halving artifact size
and weight-read bandwidth with bf16-rounding-level output agreement.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_VERSION = 1
_GRAPH_FILE = "predict.stablehlo"
_PARAMS_FILE = "params.npz"
_META_FILE = "meta.json"


def _flatten(params) -> Dict[str, np.ndarray]:
    import jax

    from xggm_tpu.training.steps import _path_str

    return {_path_str(path): np.asarray(leaf) for path, leaf
            in jax.tree_util.tree_leaves_with_path(params)}


def _unflatten(flat: Dict[str, np.ndarray]):
    nested: Dict[str, Any] = {}
    for key, leaf in flat.items():
        node = nested
        *parents, last = key.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[last] = leaf
    return nested


def _serve_params(model, params, bf16_weights: bool):
    """The param tree inference reads: masters with the bf16 shadow overlaid
    when the model computes in bf16 (same layout as trainer.predict)."""
    import jax
    import jax.numpy as jnp

    if not (bf16_weights and model.cfg.compute_dtype == jnp.bfloat16):
        return params
    from xggm_tpu.training.steps import _path_str, bf16_param_shadow

    shadow = bf16_param_shadow(params)
    return jax.tree_util.tree_map_with_path(
        lambda path, p: shadow.get(_path_str(path), p), params)


def export_model(model, params, path: str, *,
                 batch_size: Optional[int] = 16,
                 label2ans: Optional[List[str]] = None,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 bf16_weights: bool = True,
                 quantize: Optional[str] = None,
                 notes: Optional[dict] = None) -> str:
    """Export `model`'s inference step (encoder + answer head, GGM absent -
    reference gqa_ood.py:379-396) as a self-contained artifact directory.

    batch_size=None exports with a symbolic batch dimension (any batch size;
    XLA compiles per concrete shape at call time). A static batch_size is
    the TPU-right default - the server pads ragged tails to it.

    quantize="int8" stores Dense kernels as per-channel int8 and traces the
    graph with dynamic int8 activation quantization (serving/quant.py) -
    the v5e MXU runs int8 GEMMs at 2x the bf16 rate.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from xggm_tpu.config import MAX_SEQ_LENGTH, NUM_OBJECTS
    from xggm_tpu.models.task_model import XGGMModel

    serve = _serve_params(model, params, bf16_weights)
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize mode {quantize!r}")
    apply_fn = type(model).apply
    if quantize == "int8":
        from xggm_tpu.serving.quant import (intercepted_apply,
                                            quantize_dense_params)

        serve, n_q = quantize_dense_params(serve)
        if n_q == 0:
            raise ValueError("quantize='int8' found no Dense kernels")
        apply_fn = intercepted_apply

    def predict(p, input_ids, input_mask, segment_ids, feats, boxes):
        if isinstance(model, XGGMModel):
            return apply_fn(model, p, input_ids, input_mask, segment_ids,
                            feats, boxes, deterministic=True,
                            method=XGGMModel.clean_forward)
        return apply_fn(model, p, input_ids, input_mask, segment_ids, feats,
                        boxes, deterministic=True)

    feat_dim = model.cfg.visual.visual_feat_dim
    feats_dtype = (jnp.bfloat16
                   if model.cfg.compute_dtype == jnp.bfloat16
                   else jnp.float32)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    spec = jax.ShapeDtypeStruct
    input_specs = (
        spec((b, MAX_SEQ_LENGTH), jnp.int32),   # input_ids
        spec((b, MAX_SEQ_LENGTH), jnp.int32),   # input_mask
        spec((b, MAX_SEQ_LENGTH), jnp.int32),   # segment_ids
        spec((b, NUM_OBJECTS, feat_dim), feats_dtype),
        spec((b, NUM_OBJECTS, 4), jnp.float32),  # boxes
    )
    param_specs = jax.tree.map(lambda x: spec(x.shape, x.dtype), serve)
    exported = jexport.export(jax.jit(predict), platforms=list(platforms))(
        param_specs, *input_specs)

    flat = _flatten(serve)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _GRAPH_FILE), "wb") as f:
        f.write(exported.serialize())
    dtypes = {k: str(v.dtype) for k, v in flat.items()}
    # npz cannot represent bf16: store the raw bits as uint16
    np.savez(os.path.join(path, _PARAMS_FILE),
             **{k: (v.view(np.uint16) if v.dtype == jnp.bfloat16 else v)
                for k, v in flat.items()})
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch_size": batch_size,
        "seq_len": MAX_SEQ_LENGTH,
        "num_objects": NUM_OBJECTS,
        "feat_dim": feat_dim,
        "feats_dtype": str(jnp.dtype(feats_dtype)),
        "quantize": quantize,
        "num_answers": int(model.num_answers),
        "param_dtypes": dtypes,
        "label2ans": label2ans,
        "notes": notes or {},
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return path


class ServingModel:
    """A loaded artifact: callable inference with zero model-code imports."""

    def __init__(self, exported, params, meta: dict):
        import jax

        self._exported = exported
        self._params = params
        self.meta = meta
        self.batch_size: Optional[int] = meta["batch_size"]
        self.label2ans: Optional[List[str]] = meta.get("label2ans")
        # Exported.call is traceable: jit caches the per-shape compilation
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        import ml_dtypes
        from jax import export as jexport

        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        if meta["artifact_version"] != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {meta['artifact_version']} != "
                f"{ARTIFACT_VERSION} supported by this build")
        with open(os.path.join(path, _GRAPH_FILE), "rb") as f:
            exported = jexport.deserialize(f.read())
        raw = np.load(os.path.join(path, _PARAMS_FILE))
        flat = {}
        for key in raw.files:
            arr = raw[key]
            if meta["param_dtypes"][key] == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16)
            flat[key] = arr
        return cls(exported, _unflatten(flat), meta)

    # ------------------------------------------------------------------

    def pad_batch(self, batch: Dict[str, np.ndarray]
                  ) -> Tuple[Dict[str, np.ndarray], int]:
        """Pad a ragged batch up to the exported static batch size by
        repeating the last row (the SPMD eval recipe, parallel/mesh.py);
        returns (padded batch, number of valid rows)."""
        n = len(batch["input_ids"])
        if self.batch_size is None or n == self.batch_size:
            return batch, n
        if n > self.batch_size:
            raise ValueError(f"batch of {n} > exported batch_size "
                             f"{self.batch_size}; chunk it")
        pad = self.batch_size - n
        return {k: np.concatenate([v] + [v[-1:]] * pad, axis=0)
                for k, v in batch.items()}, n

    def predict_logits(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """batch: input_ids/input_mask/segment_ids [n, seq] int32,
        feats [n, 36, feat_dim], boxes [n, 36, 4] -> logits [n, A] fp32."""
        import ml_dtypes

        padded, n = self.pad_batch(batch)
        feats = padded["feats"]
        if self.meta["feats_dtype"] == "bfloat16":
            feats = feats.astype(ml_dtypes.bfloat16)
        else:
            feats = feats.astype(np.float32)
        out = self._call(self._params,
                         padded["input_ids"].astype(np.int32),
                         padded["input_mask"].astype(np.int32),
                         padded["segment_ids"].astype(np.int32),
                         feats,
                         padded["boxes"].astype(np.float32))
        return np.asarray(out, dtype=np.float32)[:n]

    def predict_answers(self, batch: Dict[str, np.ndarray]) -> List[str]:
        ids = np.argmax(self.predict_logits(batch), axis=-1)
        if self.label2ans is None:
            raise ValueError("artifact was exported without label2ans")
        return [self.label2ans[int(i)] for i in ids]
