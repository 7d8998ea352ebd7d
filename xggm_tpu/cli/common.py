"""Shared CLI argument parsing - flag-compatible with the reference
(src/param.py:34-137) so the reference's shell scripts translate 1:1, plus
TPU-specific additions (--dtype, --model_parallel, --synthetic)."""
from __future__ import annotations

import argparse
import os
import random

import numpy as np

from xggm_tpu.config import (
    XGGMConfig, LxmertConfig, BertConfig, VisualConfig, GGMConfig,
    TrainConfig, DataConfig, MeshConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # Data splits (reference param.py:38-40)
    p.add_argument("--train", default="train")
    p.add_argument("--valid", default="val")
    p.add_argument("--test", default=None)
    # Training hyperparameters (:43-52)
    p.add_argument("--bs", dest="batch_size", type=int, default=8)
    p.add_argument("--optim", default="bert")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=9595)
    p.add_argument("--fp16", action="store_const", default=False, const=True)
    # accepted-but-inert flag, as in the reference (param.py:50: --space is
    # threaded into VQADataset.__init__ which never reads it)
    p.add_argument("--space", type=int, default=1, choices=[1, 9, 12])
    p.add_argument("--tf_writer", default=True,
                   type=lambda s: s in ("True", "true", "1", True))
    # Debugging (:55-58)
    p.add_argument("--output", type=str, default="snap/debug")
    p.add_argument("--fast", action="store_const", default=False, const=True)
    p.add_argument("--tiny", action="store_const", default=False, const=True)
    p.add_argument("--tqdm", action="store_const", default=False, const=True)
    # Model loading (:61-75)
    p.add_argument("--load", type=str, default=None)
    p.add_argument("--loadLXMERT", dest="load_lxmert", type=str, default=None)
    p.add_argument("--loadLXMERTQA", dest="load_lxmert_qa", type=str,
                   default=None)
    p.add_argument("--fromScratch", dest="from_scratch",
                   action="store_const", default=False, const=True)
    p.add_argument("--mceLoss", dest="mce_loss", action="store_const",
                   default=False, const=True)
    # LXRT architecture (:83-88)
    p.add_argument("--llayers", default=9, type=int)
    p.add_argument("--xlayers", default=5, type=int)
    p.add_argument("--rlayers", default=5, type=int)
    # Pretraining task switches (:91-105)
    p.add_argument("--taskMatched", dest="task_matched",
                   action="store_const", default=False, const=True)
    p.add_argument("--taskMaskLM", dest="task_mask_lm",
                   action="store_const", default=False, const=True)
    p.add_argument("--taskObjPredict", dest="task_obj_predict",
                   action="store_const", default=False, const=True)
    p.add_argument("--taskQA", dest="task_qa",
                   action="store_const", default=False, const=True)
    p.add_argument("--visualLosses", dest="visual_losses",
                   default="obj,attr,feat", type=str)
    p.add_argument("--qaSets", dest="qa_sets", default=None, type=str)
    p.add_argument("--wordMaskRate", dest="word_mask_rate", default=0.15,
                   type=float)
    p.add_argument("--objMaskRate", dest="obj_mask_rate", default=0.15,
                   type=float)
    # Training configuration (:108-110)
    p.add_argument("--multiGPU", action="store_const", default=False,
                   const=True, help="shard the batch over all local devices")
    p.add_argument("--numWorkers", dest="num_workers", default=0, type=int)
    # OOD config (:113-120)
    p.add_argument("--tmode", default="OOD", type=str)
    p.add_argument("--gnn", default="GCN", type=str)
    p.add_argument("--num_layer", default=2, type=int)
    p.add_argument("--sigma", default=1.0, type=float)
    p.add_argument("--delta", default=5, type=int)
    # TPU-native additions
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--model_parallel", default=1, type=int)
    p.add_argument("--pp", dest="pp_stages", default=0, type=int,
                   help="pipeline-parallel stages: run the lang->visn->x "
                        "encoder sequence as a GPipe pipeline over a mesh "
                        "'pipe' axis of this size (requires --multiGPU; "
                        "implies the stacked-layers param layout)")
    p.add_argument("--pp_microbatches", default=4, type=int,
                   help="microbatches per pipelined step (bubble fraction "
                        "= (S-1)/(M+S-1); per-microbatch rows must divide "
                        "the data axis)")
    # dead reference flag (param.py:113, dest edge_gnn - never read by any
    # live code path); accepted so reference launch scripts parse unchanged
    p.add_argument("--eg", dest="edge_gnn", default=None)
    # multi-host SPMD (parallel/distributed.py): every host launches the
    # same command with its own --host_id; TPU pods autodetect all three
    p.add_argument("--coordinator", default=None, type=str,
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num_hosts", default=None, type=int)
    p.add_argument("--host_id", default=None, type=int)
    p.add_argument("--data_root", default="data", type=str)
    p.add_argument("--vocab", default=None, type=str,
                   help="WordPiece vocab.txt (default {data_root}/vocab.txt)")
    p.add_argument("--all_ans", default=None, type=str,
                   help="all_ans.json for answer-head surgery "
                        "(default {data_root}/lxmert/all_ans.json)")
    p.add_argument("--synthetic", action="store_const", default=False,
                   const=True, help="generate a synthetic corpus in-place "
                                    "(smoke runs without real data)")
    p.add_argument("--xpack", action="store_const", default=False, const=True,
                   help="use the native packed-binary feature loader "
                        "(expects {split}_obj36.xpack next to the h5 files; "
                        "build with tools/make_xpack.py)")
    p.add_argument("--profile", default=0, type=int,
                   help="capture a jax.profiler trace of the first N steps "
                        "into {output}/trace")
    p.add_argument("--resume", action="store_const", default=False,
                   const=True, help="resume from the newest checkpoint in "
                                    "--output (full train state incl. "
                                    "optimizer): a mid-epoch PREEMPT save "
                                    "(written on SIGTERM) or BEST_{epoch}")
    p.add_argument("--pallas_attention", action="store_const", default=False,
                   const=True, help="use the Pallas fused-attention kernel")
    p.add_argument("--remat", action="store_const", default=False, const=True,
                   help="rematerialize encoder-layer activations in the "
                        "backward pass (jax.checkpoint): O(1) activation "
                        "memory across the layer stacks for ~1/3 more FLOPs "
                        "- unlocks batch sizes past the HBM ceiling")
    p.add_argument("--accum_steps", default=1, type=int,
                   help="pretraining gradient accumulation: one BertAdam "
                        "step per N microbatches of --bs (effective batch "
                        "= N x bs)")
    p.add_argument("--shard_opt_state", action="store_const", default=False,
                   const=True,
                   help="ZeRO-style optimizer-state sharding over the mesh's "
                        "data axis (requires --multiGPU): each chip holds "
                        "1/N of the fp32 BertAdam moments (and of the fp32 "
                        "masters when the bf16 shadow is active) - HBM "
                        "headroom for models whose optimizer state outgrows "
                        "a chip")
    p.add_argument("--prng", default="rbg", choices=["rbg", "threefry2x32"],
                   help="jax PRNG implementation for dropout keys; rbg is "
                        "the TPU-native generator (-18%% step time on v5e). "
                        "Dropout quality is equivalent; draws differ.")
    p.add_argument("--device", default=None, choices=["cpu", "tpu"],
                   help="force the jax platform (default: whatever jax "
                        "initialized with). --device cpu makes every CLI "
                        "path runnable hermetically, e.g. in CI")
    return p


def to_config(args: argparse.Namespace, task: str) -> XGGMConfig:
    clean_first = (task == "vqa")  # reference ordering difference (§3.2)
    rel_d_mult = 8.0 if task == "vqa" else 12.0
    # --fp16 is the reference's apex mixed-precision switch (param.py:52);
    # the TPU analog is bf16 compute, which is already the default. The flag
    # only matters when someone combines it with an explicit --dtype float32.
    if getattr(args, "fp16", False) and args.dtype == "float32":
        import warnings
        warnings.warn("--fp16 requested with --dtype float32: using bf16 "
                      "mixed precision (the TPU equivalent of apex fp16)")
        args.dtype = "bfloat16"
    cfg = XGGMConfig(
        lxmert=LxmertConfig(
            bert=BertConfig(hidden_dropout_prob=args.dropout,
                            attention_probs_dropout_prob=args.dropout,
                            use_pallas_attention=getattr(
                                args, "pallas_attention", False)),
            visual=VisualConfig(l_layers=args.llayers, x_layers=args.xlayers,
                                r_layers=args.rlayers),
            dtype=args.dtype,
            remat=getattr(args, "remat", False),
            # --pp implies the stacked [L, ...] param layout the pipeline's
            # superset stack is built from (checkpoints interchange)
            stacked_layers=getattr(args, "pp_stages", 0) > 1,
            pp_stages=getattr(args, "pp_stages", 0),
            pp_microbatches=getattr(args, "pp_microbatches", 4),
        ),
        ggm=GGMConfig(gnn=args.gnn, num_layers=args.num_layer,
                      sigma=args.sigma, delta=args.delta),
        train=TrainConfig(batch_size=args.batch_size, optim=args.optim,
                          lr=args.lr, epochs=args.epochs,
                          dropout=args.dropout, seed=args.seed,
                          clean_phase_first=clean_first,
                          rel_d_mult=rel_d_mult,
                          accum_steps=getattr(args, "accum_steps", 1),
                          shard_opt_state=getattr(args, "shard_opt_state",
                                                  False)),
        data=DataConfig(train=args.train or "",
                        valid=args.valid or "",
                        test=args.test, tiny=args.tiny, fast=args.fast,
                        num_workers=args.num_workers,
                        data_root=args.data_root,
                        vocab_path=args.vocab),
        mesh=MeshConfig(model_parallel=args.model_parallel),
        output=args.output,
        tmode=args.tmode,
    )
    return cfg


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def configure_prng(args) -> None:
    """Select the jax platform + PRNG implementation for this process (must
    run before any PRNGKey / device array is created).

    --device is applied via jax.config (NOT env vars): a sitecustomize in
    this environment pre-imports jax, so JAX_PLATFORMS set after process
    start is ignored (CLAUDE.md quirk); jax.config.update works regardless.
    """
    import jax

    device = getattr(args, "device", None)
    if device:
        jax.config.update("jax_platforms", device)

    impl = getattr(args, "prng", "rbg")
    jax.config.update("jax_default_prng_impl", impl)


def make_mesh_if_requested(args):
    multi_host = getattr(args, "coordinator", None) is not None or \
        getattr(args, "num_hosts", None) is not None
    pp = getattr(args, "pp_stages", 0)
    if pp > 1:
        if multi_host:
            raise ValueError("--pp composes with --multiGPU single-host "
                             "meshes; multi-host pipeline stages are not "
                             "supported (stages must sit on ICI)")
        if not args.multiGPU:
            raise ValueError("--pp requires --multiGPU (a device mesh)")
        from xggm_tpu.parallel.mesh import make_mesh
        from xggm_tpu.parallel.pipeline_lxmert import set_pipeline_mesh

        mesh = make_mesh(model_parallel=args.model_parallel,
                         pipeline_parallel=pp)
        set_pipeline_mesh(mesh, axis="pipe", batch_axis="data",
                          n_microbatches=getattr(args, "pp_microbatches", 4))
        return mesh
    if multi_host:
        from xggm_tpu.parallel.distributed import (
            init_distributed, make_hybrid_mesh)
        if args.coordinator == "auto":  # TPU pod / SLURM autodetection
            init_distributed(auto=True)
        else:
            init_distributed(coordinator_address=args.coordinator,
                             num_processes=args.num_hosts,
                             process_id=args.host_id)
        return make_hybrid_mesh(model_parallel=args.model_parallel)
    if not args.multiGPU:
        return None
    from xggm_tpu.parallel.mesh import make_mesh

    return make_mesh(model_parallel=args.model_parallel)


def generate_synthetic_once(generate, data_root: str) -> None:
    """Synthetic corpus generation that is multi-host-safe.

    Two hosts racing the same h5/json writes on a shared filesystem would
    corrupt them, so process 0 generates first (plus a completion sentinel)
    and everyone barriers; hosts that then don't see the sentinel have
    private filesystems and generate their own (deterministic, seeded)
    copy. Call AFTER make_mesh_if_requested (the distributed runtime must
    be up for process_index/barrier).
    """
    import jax

    if jax.process_count() <= 1:
        generate()
        return
    sentinel = os.path.join(data_root, ".synthetic_complete")
    if jax.process_index() == 0:
        generate()
        os.makedirs(data_root, exist_ok=True)
        with open(sentinel, "w") as f:
            f.write("ok")
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("xggm:synthetic-data")
    if not os.path.exists(sentinel):
        generate()


def dump_args(args: argparse.Namespace, output: str) -> None:
    """Run-config dump (reference gqa_ood.py:470 writes args.json)."""
    import json

    import jax

    if jax.process_index() != 0:  # one writer under multi-host
        return
    os.makedirs(output, exist_ok=True)
    with open(os.path.join(output, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
