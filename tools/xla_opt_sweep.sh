#!/bin/bash
# Per-compile XLA:TPU option sweep over the full two-phase step
# (tools/perf_probe.py --compiler_opts). Each option is a fresh remote
# compile (~5-10 min on the axon relay); run in a background shell.
# Unknown/rejected options fail that one run and the sweep continues.
cd "$(dirname "$0")/.."
OPTS=(
  "xla_tpu_enable_latency_hiding_scheduler=false"
  "xla_latency_hiding_scheduler_rerun=3"
  "xla_tpu_rwb_fusion=false"
  "xla_tpu_enable_dot_strength_reduction=false"
  "xla_tpu_licm_size_inflation_ratio=2.0"
  "xla_tpu_async_copy_bandwidth_scaling_factor=2.0"
  "xla_tpu_async_copy_bandwidth_scaling_factor=0.5"
)
for o in "${OPTS[@]}"; do
  echo "=== $o"
  timeout 2400 python tools/perf_probe.py --variants step --prng rbg \
    --compiler_opts "$o" 2>&1 | tail -4
done
echo "=== sweep done"
