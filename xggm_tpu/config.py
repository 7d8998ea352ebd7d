"""Import-safe configuration dataclasses.

Replaces the reference's module-level argparse singleton (`src/param.py:34-137`,
which parses CLI args and seeds RNGs at import time) with explicit, composable
dataclasses. A CLI shim (`xggm_tpu.cli`) accepts the same flag names so the
reference's shell scripts translate 1:1.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

# Fixed data-shape contract of the reference pipeline:
# 36 objects/image, 2048-d Faster-RCNN features, 4-d boxes, 20 text tokens
# (reference src/gqa/gqa_ood_model.py:17, src/gqa/gqa_ood_data.py:118).
NUM_OBJECTS = 36
VISUAL_FEAT_DIM = 2048
VISUAL_POS_DIM = 4
MAX_SEQ_LENGTH = 20
# C(36, 2) free upper-triangular adjacency entries (reference
# src/gqa/gqa_ood_model.py:83-86: encoder_adj Linear(768 -> 630)).
NUM_TRIU_EDGES = NUM_OBJECTS * (NUM_OBJECTS - 1) // 2


@dataclass(frozen=True)
class BertConfig:
    """BERT-base encoder hyperparameters (reference src/lxrt/modeling.py:182-228)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    # Use the Pallas fused-attention kernel (TPU only; falls back to the
    # XLA einsum path on other backends or when attention dropout is active).
    use_pallas_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class VisualConfig:
    """LXMERT visual-stream config (reference src/lxrt/modeling.py:150-179)."""

    l_layers: int = 9
    x_layers: int = 5
    r_layers: int = 5
    visual_feat_dim: int = VISUAL_FEAT_DIM
    visual_pos_dim: int = VISUAL_POS_DIM
    obj_id_num: int = 1600
    attr_id_num: int = 400


@dataclass(frozen=True)
class LxmertConfig:
    """Full encoder config = BERT core + visual streams + compute policy."""

    bert: BertConfig = field(default_factory=BertConfig)
    visual: VisualConfig = field(default_factory=VisualConfig)
    # Compute dtype for matmuls/activations. bfloat16 rides the MXU at full
    # rate; params and LayerNorm/softmax accumulation stay float32.
    dtype: str = "float32"
    # Scan-over-layers: stack each homogeneous layer group's params into
    # [L, ...] leaves consumed by nn.scan (9 lang + 5 visual + 5 x-layer
    # trees -> 3 stacks). Collapses ~330 per-layer optimizer leaves into 56
    # big ones - one fused update loop per stacked leaf instead of hundreds
    # of small launches. The torch bridge stacks/unstacks transparently
    # (checkpoint/torch_bridge.stack_encoder_flat).
    #
    # Measured on v5e and REJECTED as the default (docs/PERF.md ledger):
    # the optimizer does get faster (18.7 -> 13.8 ms in the same probe run)
    # but the scan VJP's stacked-gradient accumulation costs ~12.6 ms of
    # fwd/bwd even fully unrolled - full step 102.8 ms (unroll=L) /
    # 131 ms (rolled) vs 90.2 ms per-layer. Kept as a tested opt-in
    # (equivalence pinned by tests/test_parity.py).
    stacked_layers: bool = False
    # Activation rematerialization (jax.checkpoint) over every encoder
    # layer: the backward pass recomputes each layer's activations instead
    # of holding them in HBM, trading ~1/3 more FLOPs for O(L) -> O(1)
    # activation memory in the layer stacks. TPU-side scaling knob (no
    # reference counterpart - torch would use torch.utils.checkpoint);
    # enables batch sizes past the HBM ceiling, where the throughput-per-
    # chip gain of the bigger batch outweighs the recompute (docs/PERF.md
    # batch-scaling table).
    remat: bool = False
    # Pipeline parallelism (parallel/pipeline_lxmert.py): run the
    # lang->visn->x layer sequence as a GPipe pipeline over a mesh 'pipe'
    # axis of this size (0/1 = off). Requires stacked_layers (the [L, ...]
    # param layout the superset stack is built from) and a process-global
    # pipeline mesh (parallel.set_pipeline_mesh; the trainers set it when
    # --pp is given). Scale headroom beyond the reference's DataParallel -
    # stages hold 1/S of the virtual-layer weights.
    pp_stages: int = 0
    # microbatches per pipeline step; bubble fraction = (S-1)/(M+S-1)
    pp_microbatches: int = 4

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def replace(self, **kw) -> "LxmertConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class GGMConfig:
    """Graph-generative-module config (reference src/param.py:113-120)."""

    gnn: str = "GCN"  # 'GCN' | 'GIN' | 'GAT'
    num_layers: int = 2  # --num_layer
    sigma: float = 1.0  # score-matching noise scale
    delta: int = 5  # relation-branch prob = delta/10 (randint(1,10) <= delta)
    dropout: float = 0.5  # generator dropout (reference generators default 0.5)
    gat_heads: int = 2  # reference graph_generative_modeling.py:244


@dataclass(frozen=True)
class TrainConfig:
    """Trainer hyperparameters (reference src/param.py:43-58 + trainer code)."""

    batch_size: int = 32
    optim: str = "bert"
    lr: float = 1e-5
    epochs: int = 4
    dropout: float = 0.1
    seed: int = 9595
    # BertAdam specifics (reference src/gqa/gqa_ood.py:118-137):
    warmup: float = 0.1
    downstream_lr_mult: float = 4.0  # downstream params train at 4x base lr
    t_total_mult: float = 2.0  # t_total = 2 x (steps) - two optim steps/batch
    weight_decay: float = 0.01
    grad_clip: float = 5.0  # external clip (reference gqa_ood.py:230)
    # Loss multipliers - GQA variant (reference src/gqa/gqa_ood.py:197,226-228,
    # 246,275-277); VQA uses rel_d_mult=8 (src/vqa/vqacpv2.py:212).
    rel_d_mult: float = 12.0
    rel_sm_mult: float = 6.0
    rep_d_mult: float = 0.15
    rep_grad_mult: float = 6.0
    rep_sm_mult: float = 1.1
    # Clean-first ordering: VQA-CP runs the plain BCE step before the GGM step
    # (src/vqa/vqacpv2.py:170-254); GQA runs GGM first (src/gqa/gqa_ood.py:172-289).
    clean_phase_first: bool = False
    # Carry a bf16 working copy of the bf16-consumed params across steps so
    # fwd/bwd GEMMs read half the weight bytes (TPU-side optimization; only
    # active with bfloat16 compute). The model casts those leaves to bf16 at
    # use either way, so this is the same bf16 computation - equal to the
    # fp32-param path at bf16 rounding level (XLA's excess-precision folding
    # may keep extra precision in the fp32-param graph; see
    # tests/test_bf16_shadow.py). -2.7% step time on v5e (docs/PERF.md).
    bf16_params: bool = True
    # Gradient accumulation for LXMERT pretraining (training/pretrainer.py):
    # accumulate grads over `accum_steps` consecutive microbatches of
    # `batch_size` on device, then run ONE BertAdam update on their mean -
    # effective batch = batch_size x accum_steps without the activation
    # memory of the big batch (combine with lxmert.remat to push further).
    # The schedule's t_total counts OPTIMIZER steps, so warmup spans the
    # same fraction of training. TPU-side scaling knob, no reference
    # counterpart; the two-phase fine-tune recipes pin their batch sizes
    # (96/92) and do not use it.
    accum_steps: int = 1
    # ZeRO-style optimizer-state sharding over the mesh's 'data' axis
    # (parallel/mesh.zero_state_shardings): each chip holds 1/N of BertAdam's
    # fp32 m/v moments - and of the fp32 masters whose compute copies live in
    # the bf16 shadow - trading one bf16 all-gather of the refreshed shadow
    # per optimizer step for an ~(12/N + 2)-bytes-per-param HBM footprint
    # (vs 14 replicated). Scale-out knob for models whose optimizer state
    # outgrows a chip; no reference counterpart (its DataParallel keeps all
    # gradient math on device 0). Requires a mesh; works multi-host too
    # (checkpoint snapshots allgather the cross-process shards -
    # checkpoint/manager.py, tests/test_distributed.py).
    shard_opt_state: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Data-pipeline config (reference src/param.py:38-40,55-58,108-110)."""

    train: str = "train"
    valid: str = "val"
    test: Optional[str] = None
    tiny: bool = False  # 512 images (reference gqa_ood_data.py:15)
    fast: bool = False  # 5000 images (reference gqa_ood_data.py:16)
    num_workers: int = 2
    data_root: str = "data"
    vocab_path: Optional[str] = None  # default: {data_root}/vocab.txt
    prefetch_depth: int = 2  # device-side double buffering


@dataclass(frozen=True)
class MeshConfig:
    """SPMD layout. The reference's only parallelism is single-process
    nn.DataParallel (src/lxrt/entry.py:103-104); here it becomes an explicit
    device mesh: batch sharded along `data`, optional `model` axis for
    tensor-sharding the wide matmuls."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1  # size of the model axis; 1 = pure DP

    def mesh_shape(self, n_devices: int) -> Tuple[int, int]:
        assert n_devices % self.model_parallel == 0
        return (n_devices // self.model_parallel, self.model_parallel)


@dataclass(frozen=True)
class XGGMConfig:
    """Top-level bundle handed to trainers."""

    lxmert: LxmertConfig = field(default_factory=LxmertConfig)
    ggm: GGMConfig = field(default_factory=GGMConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    num_answers: int = 1842  # GQA-OOD trainval answer vocabulary size
    output: str = "snap/debug"
    tmode: str = "OOD"  # ['OOD', 'ID'] (reference src/param.py:115-116)

    def replace(self, **kw) -> "XGGMConfig":
        return dataclasses.replace(self, **kw)


def gqa_ood_config(**overrides) -> XGGMConfig:
    """Shipped GQA-OOD recipe (reference script/gqa_ood.sh:3-27)."""
    cfg = XGGMConfig(
        lxmert=LxmertConfig(visual=VisualConfig(l_layers=9, x_layers=5, r_layers=5)),
        ggm=GGMConfig(gnn="GCN", num_layers=2, sigma=1.0, delta=5),
        train=TrainConfig(batch_size=96, lr=5e-6, epochs=4, clean_phase_first=False,
                          rel_d_mult=12.0),
    )
    return cfg.replace(**overrides) if overrides else cfg


def vqacpv2_config(**overrides) -> XGGMConfig:
    """Shipped VQA-CP v2 recipe (reference script/vqacpv2.sh:9-28). delta=0
    means the relation branch never fires; clean phase runs first."""
    cfg = XGGMConfig(
        lxmert=LxmertConfig(visual=VisualConfig(l_layers=9, x_layers=5, r_layers=5)),
        ggm=GGMConfig(gnn="GCN", num_layers=2, sigma=1.0, delta=0),
        train=TrainConfig(batch_size=92, lr=1e-6, epochs=4, clean_phase_first=True,
                          rel_d_mult=8.0),
        num_answers=16039,  # VQA-CP v2 trainval answer vocabulary
    )
    return cfg.replace(**overrides) if overrides else cfg


def tiny_test_config(**overrides) -> XGGMConfig:
    """Small config for unit tests / CI: 2/1/1 layers, small dims."""
    cfg = XGGMConfig(
        lxmert=LxmertConfig(
            bert=BertConfig(vocab_size=128, hidden_size=64,
                            num_attention_heads=4, intermediate_size=128,
                            max_position_embeddings=64, hidden_dropout_prob=0.1),
            visual=VisualConfig(l_layers=2, x_layers=1, r_layers=1,
                                visual_feat_dim=32, visual_pos_dim=4),
        ),
        ggm=GGMConfig(gnn="GCN", num_layers=2, sigma=1.0, delta=5),
        train=TrainConfig(batch_size=4, lr=1e-4, epochs=1),
        num_answers=16,
    )
    return cfg.replace(**overrides) if overrides else cfg
