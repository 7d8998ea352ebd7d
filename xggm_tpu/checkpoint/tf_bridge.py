"""TensorFlow BERT checkpoint -> JAX param bridge.

Equivalent of the reference's TF import path (reference
load_tf_weights_in_bert, src/lxrt/modeling.py:52-113): reads a
google-research BERT checkpoint (`bert/encoder/layer_N/...` variables) and
maps it onto this framework's BertTextModel / LXMERT language-stream tree.
TF dense kernels are already [in, out], so no transposes are needed (unlike
the torch bridge).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def read_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load all variables of a TF checkpoint into numpy."""
    try:
        import tensorflow as tf
    except Exception as e:  # pragma: no cover
        raise ImportError(
            "tensorflow is required to read TF checkpoints; convert the "
            "checkpoint to torch/.npz offline instead") from e

    reader = tf.train.load_checkpoint(path)
    return {name: reader.get_tensor(name)
            for name, _ in tf.train.list_variables(path)}


def convert_tf_bert(tf_vars: Dict[str, np.ndarray], num_layers: int = 12,
                    prefix: str = "bert/") -> Tuple[Dict[str, np.ndarray],
                                                    List[str]]:
    """Map TF BERT variables onto our BertTextModel flat paths."""
    out: Dict[str, np.ndarray] = {}
    missing: List[str] = []

    def take(name):
        full = prefix + name
        if full in tf_vars:
            return tf_vars[full]
        missing.append(full)
        return None

    def put(path, val):
        if val is not None:
            out[path] = np.asarray(val)

    put("embeddings/word_embeddings/embedding",
        take("embeddings/word_embeddings"))
    put("embeddings/position_embeddings/embedding",
        take("embeddings/position_embeddings"))
    put("embeddings/token_type_embeddings/embedding",
        take("embeddings/token_type_embeddings"))
    put("embeddings/LayerNorm/scale", take("embeddings/LayerNorm/gamma"))
    put("embeddings/LayerNorm/bias", take("embeddings/LayerNorm/beta"))

    for i in range(num_layers):
        t = f"encoder/layer_{i}"
        o = f"layer_{i}"
        qkv_k = [take(f"{t}/attention/self/{n}/kernel")
                 for n in ("query", "key", "value")]
        qkv_b = [take(f"{t}/attention/self/{n}/bias")
                 for n in ("query", "key", "value")]
        if all(k is not None for k in qkv_k):
            out[f"{o}/attention/self/qkv/kernel"] = np.concatenate(qkv_k, 1)
        if all(b is not None for b in qkv_b):
            out[f"{o}/attention/self/qkv/bias"] = np.concatenate(qkv_b, 0)
        put(f"{o}/attention/output/dense/kernel",
            take(f"{t}/attention/output/dense/kernel"))
        put(f"{o}/attention/output/dense/bias",
            take(f"{t}/attention/output/dense/bias"))
        put(f"{o}/attention/output/LayerNorm/scale",
            take(f"{t}/attention/output/LayerNorm/gamma"))
        put(f"{o}/attention/output/LayerNorm/bias",
            take(f"{t}/attention/output/LayerNorm/beta"))
        put(f"{o}/mlp/intermediate/kernel",
            take(f"{t}/intermediate/dense/kernel"))
        put(f"{o}/mlp/intermediate/bias",
            take(f"{t}/intermediate/dense/bias"))
        put(f"{o}/mlp/output/kernel", take(f"{t}/output/dense/kernel"))
        put(f"{o}/mlp/output/bias", take(f"{t}/output/dense/bias"))
        put(f"{o}/mlp/LayerNorm/scale", take(f"{t}/output/LayerNorm/gamma"))
        put(f"{o}/mlp/LayerNorm/bias", take(f"{t}/output/LayerNorm/beta"))

    put("pooler/dense/kernel", take("pooler/dense/kernel"))
    put("pooler/dense/bias", take("pooler/dense/bias"))
    return out, missing
