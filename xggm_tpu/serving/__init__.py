"""Production inference serving: AOT-exported model artifacts + HTTP server.

The reference has no serving story (its test arm, src/gqa/gqa_ood.py:379-403,
is an offline predict loop); this subsystem is the TPU-native deployment
path: `jax.export` serializes the compiled inference graph (StableHLO) into a
self-contained artifact that loads and runs WITHOUT the model code, flax, or
the training stack - the standard compile-once/serve-many pattern for XLA
backends.
"""
from xggm_tpu.serving.artifact import export_model, ServingModel

__all__ = ["export_model", "ServingModel"]
