"""Task trainers: the L5 layer (reference src/gqa/gqa_ood.py:70-480,
src/vqa/vqacpv2.py:70-412, src/vqa/vqacpv2_baseline.py:67-339).

Orchestration redesigned TPU-first:
  * branch selection (randint(1,10) <= delta) happens on HOST per batch and
    dispatches one of two pre-compiled step functions - the traced graphs
    contain no data-dependent control flow;
  * batches stream through the double-buffered device feeder, sharded over
    the SPMD mesh;
  * checkpoints capture the full train state (params + optimizer + step) via
    orbax and support exact resume - beyond the reference's weights-only
    save (gqa_ood.py:421-431);
  * same observable behavior: two optimizer steps per batch, mid-epoch
    validation at 3 linspace points (gqa_ood.py:157,338-350), BEST /
    BEST_{epoch} checkpoint policy, log.log appends.
"""
from __future__ import annotations

import os
import random
import time
from typing import Dict, Optional

import jax
import numpy as np

from xggm_tpu.config import XGGMConfig, MAX_SEQ_LENGTH
from xggm_tpu.data.datasets import (
    GQADataset, VQACPDataset, GraphBatchDataset, GQAEvaluator, VQAEvaluator,
    oracle_score,
)
from xggm_tpu.data.feeder import Feeder
from xggm_tpu.parallel.distributed import to_host
from xggm_tpu.utils.guard import check_step_finite
from xggm_tpu.utils.preempt import (
    Preempted, PreemptionGuard, pack_rng_state, unpack_rng_state)
from xggm_tpu.data.tokenizer import BertTokenizer
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
from xggm_tpu.training.steps import (
    TrainState, make_ggm_train_step, make_clean_train_step, make_eval_step,
)
from xggm_tpu.training.metrics import MetricsLogger


class XGGMTrainer:
    """Train/predict/evaluate driver for one task ('gqa' or 'vqa')."""

    def __init__(self, cfg: XGGMConfig, task: str = "gqa",
                 tokenizer: Optional[BertTokenizer] = None, mesh=None,
                 use_xpack: bool = False, profile_steps: int = 0):
        assert task in ("gqa", "vqa")
        self.use_xpack = use_xpack
        self.profile_steps = profile_steps
        self.cfg = cfg
        self.task = task
        self.mesh = mesh
        if cfg.lxmert.pp_stages > 1:
            # library entry (the CLI already did this): register the
            # pipeline mesh before any step is built/traced
            if mesh is None:
                raise ValueError("pp_stages > 1 requires a device mesh "
                                 "with a 'pipe' axis (make_mesh("
                                 "pipeline_parallel=N))")
            from xggm_tpu.parallel.pipeline_lxmert import set_pipeline_mesh
            set_pipeline_mesh(mesh, axis="pipe", batch_axis="data",
                              n_microbatches=cfg.lxmert.pp_microbatches)
        # bf16 compute -> ship bf16 visual features (halves the dominant
        # host->device transfer; the model casts them on entry regardless)
        import jax.numpy as jnp
        self._feats_dtype = (jnp.bfloat16
                             if cfg.lxmert.compute_dtype == jnp.bfloat16
                             else None)
        self.output = cfg.output
        os.makedirs(self.output, exist_ok=True)

        vocab = cfg.data.vocab_path or os.path.join(cfg.data.data_root,
                                                    "vocab.txt")
        self.tokenizer = tokenizer or BertTokenizer.from_file(vocab)

        ds_cls = GQADataset if task == "gqa" else VQACPDataset
        self.ev_cls = GQAEvaluator if task == "gqa" else VQAEvaluator

        def make_set(split):
            raw = ds_cls(split, cfg.data)
            store = self._maybe_xpack_store(raw) if use_xpack else None
            return raw, GraphBatchDataset(raw, self.tokenizer,
                                          MAX_SEQ_LENGTH, store=store)

        self.train_set = None
        num_answers = None
        if cfg.data.train:
            raw, self.train_set = make_set(cfg.data.train)
            self.train_evaluator = self.ev_cls(raw)
            num_answers = raw.num_answers
        self.valid_set = None
        if cfg.data.valid:
            raw, self.valid_set = make_set(cfg.data.valid)
            self.valid_evaluator = self.ev_cls(raw)
            if num_answers is None:  # vocab from any split present
                num_answers = raw.num_answers
        if num_answers is None:
            num_answers = cfg.num_answers

        self.label2ans = raw.label2ans
        self.num_answers = num_answers
        self.cfg = cfg = cfg.replace(num_answers=num_answers)

        # Pallas attention partitions over any mesh: the kernels carry
        # custom_partitioning rules (batch-parallel over the leading axis,
        # ops/pallas_attention._dim0_partition), so the fused path survives
        # multi-device SPMD - matching the reference carrying its full model
        # under DataParallel (src/lxrt/entry.py:103-104).
        self.model = XGGMModel(cfg.lxmert, cfg.ggm, num_answers)
        self.params = self._init_params()

        # Optimizer: downstream params at 4x base lr, encoder at base
        # (reference gqa_ood.py:118-137); t_total = 2 x batches x epochs.
        if self.train_set is not None:
            steps_per_epoch = len(self.train_set) // cfg.train.batch_size
            t_total = int(cfg.train.t_total_mult * steps_per_epoch
                          * cfg.train.epochs)
        else:
            t_total = -1
        scales = lr_scale_tree(
            self.params, lambda p: not p.startswith("params/lxrt"),
            cfg.train.downstream_lr_mult, 1.0)
        self.tx = bert_adam(
            lr=cfg.train.downstream_lr_mult * cfg.train.lr,
            warmup=cfg.train.warmup, t_total=t_total,
            weight_decay=cfg.train.weight_decay,
            lr_scale=jax.tree.map(
                lambda s: s / cfg.train.downstream_lr_mult, scales))
        self._param_shardings = None
        if self.mesh is not None:
            # place params on the mesh; with a model axis > 1 the wide
            # projections (answer head, FFN) shard tensor-parallel
            from xggm_tpu.parallel.mesh import param_shardings

            psh = param_shardings(self.params, self.mesh)
            self.params = jax.tree.map(jax.device_put, self.params, psh)
            self._param_shardings = psh
        self.state = self._make_state(self.params)

        ssh = self._state_shardings
        self.rel_step = make_ggm_train_step(self.model, self.tx, cfg.train,
                                            "relation", state_shardings=ssh)
        self.rep_step = make_ggm_train_step(self.model, self.tx, cfg.train,
                                            "representation",
                                            state_shardings=ssh)
        self.clean_step = make_clean_train_step(self.model, self.tx,
                                                cfg.train, num_answers,
                                                state_shardings=ssh)
        self.eval_step = make_eval_step(self.model)

        from xggm_tpu.checkpoint.manager import CheckpointManager
        self.ckpt = CheckpointManager(self.output)
        # Multi-host (parallel/distributed.py): every process runs this
        # trainer on the same global batch stream; file-writing side
        # effects (metrics JSONL, log.log) happen once, on process 0.
        # Checkpoint saves are NOT gated - orbax saves are collective
        # (every process contributes its addressable shards).
        self.primary = jax.process_index() == 0
        self.logger = MetricsLogger(self.output) if self.primary \
            else MetricsLogger(None)
        self.host_rng = random.Random(cfg.train.seed)
        self.key = jax.random.PRNGKey(cfg.train.seed)
        # Preemption guard: installed lazily (first train() call) so merely
        # constructing a trainer never touches process signal handlers.
        self.preempt: Optional[PreemptionGuard] = None
        self._resume_cursor: Optional[Dict[str, int]] = None

    # ------------------------------------------------------------------

    @staticmethod
    def _maybe_xpack_store(raw):
        """Use the native packed loader when a {split}_obj36.xpack exists
        next to the H5 files (built by tools/make_xpack.py)."""
        sub = "gqa_imgfeat" if isinstance(raw, GQADataset) else "mscoco_imgfeat"
        pack = os.path.join(raw.cfg.data_root, sub,
                            f"{raw.splits[0]}_obj36.xpack")
        if os.path.exists(pack):
            from xggm_tpu.data.xpack import XPackFeatureStore

            print(f"using native xpack store: {pack}")
            return XPackFeatureStore(pack)
        return None

    def _make_state(self, params, opt_state=None) -> TrainState:
        """Fresh TrainState: fp32 masters + (with bf16 compute) the bf16
        param shadow the train steps read from (steps.bf16_param_shadow -
        bit-identical math, half the weight-read bytes). With
        cfg.train.shard_opt_state, the state lands in its ZeRO layout
        (m/v + shadowed masters sharded over 'data') and
        self._state_shardings pins that layout through the train steps -
        applied here so init, --resume and --load all restore it."""
        from xggm_tpu.training.steps import bf16_param_shadow

        use_shadow = (self.cfg.train.bf16_params
                      and self.cfg.lxmert.dtype == "bfloat16")
        from xggm_tpu.parallel.mesh import maybe_zero_shard_state

        state = TrainState(
            params,
            self.tx.init(params) if opt_state is None else opt_state,
            bf16_param_shadow(params) if use_shadow else None)
        state, self._state_shardings = maybe_zero_shard_state(
            state, self.mesh, self._param_shardings,
            self.cfg.train.shard_opt_state)
        return state

    def _init_params(self):
        cfg = self.cfg
        rng = np.random.RandomState(0)
        B = 2
        dummy = {
            "input_ids": rng.randint(1, cfg.lxmert.bert.vocab_size,
                                     (B, MAX_SEQ_LENGTH)).astype(np.int32),
            "input_mask": np.ones((B, MAX_SEQ_LENGTH), np.int32),
            "segment_ids": np.zeros((B, MAX_SEQ_LENGTH), np.int32),
            "feats": rng.randn(B, 36, cfg.lxmert.visual.visual_feat_dim
                               ).astype(np.float32),
            "boxes": rng.rand(B, 36, 4).astype(np.float32),
            "adj": rng.rand(B, 36, 36).astype(np.float32),
        }
        return self.model.init(
            {"params": jax.random.PRNGKey(cfg.train.seed),
             "dropout": jax.random.PRNGKey(cfg.train.seed + 1)},
            dummy["input_ids"], dummy["input_mask"], dummy["segment_ids"],
            dummy["feats"], dummy["boxes"], dummy["adj"],
            jax.random.PRNGKey(0), method=XGGMModel.init_all)

    def load_lxmert(self, path: str) -> None:
        """--loadLXMERT: encoder-only torch weights (reference
        entry.py:132-158)."""
        from xggm_tpu.checkpoint.torch_bridge import (
            load_torch_state_dict, strip_prefixes, convert_lxrt_bert,
            merge_into)

        sd = strip_prefixes(load_torch_state_dict(
            path if path.endswith(".pth") else f"{path}_LXRT.pth"))
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        flat, _ = convert_lxrt_bert(sd, self.cfg.lxmert, torch_prefix=prefix,
                                    our_prefix="lxrt")
        self.params, unmatched = merge_into(self.params, flat)
        self.state = self._make_state(self.params)
        print(f"load_lxmert: {len(flat)} tensors, "
              f"{len(unmatched)} model params untouched")

    def load_lxmert_qa(self, path: str, all_ans_path: str) -> None:
        """--loadLXMERTQA: encoder + answer-head surgery."""
        from xggm_tpu.checkpoint.answer_table import load_lxmert_qa

        self.params = load_lxmert_qa(path, self.params, self.label2ans,
                                     self.cfg.lxmert, all_ans_path)
        self.state = self._make_state(self.params)

    def load(self, name_or_path: str) -> None:
        """--load: fine-tuned checkpoint - orbax dir or torch .pth."""
        if name_or_path.endswith(".pth") or os.path.isfile(name_or_path):
            from xggm_tpu.checkpoint.torch_bridge import (
                load_torch_state_dict, convert_task_model, merge_into)
            sd = load_torch_state_dict(name_or_path)
            flat = convert_task_model(sd, self.cfg.lxmert, self.cfg.ggm.gnn,
                                      self.cfg.ggm.num_layers,
                                      self.cfg.ggm.gat_heads)
            self.params, unmatched = merge_into(self.params, flat)
            self.state = self._make_state(self.params)
            print(f"load(torch): {len(flat)} tensors, "
                  f"{len(unmatched)} untouched")
        else:
            restored = self.ckpt.load(
                os.path.basename(name_or_path),
                like={"params": self.state.params,
                      "opt_state": self.state.opt_state,
                      "epoch": np.asarray(-1, np.int32)})
            self.state = self._make_state(restored["params"],
                                          restored["opt_state"])
            self.params = self.state.params

    def save(self, name: str, epoch: int = -1) -> None:
        self.ckpt.save(name, {"params": self.state.params,
                              "opt_state": self.state.opt_state,
                              "epoch": np.asarray(epoch, np.int32)})

    def save_preempt(self, epoch: int, batches_done: int, train_iter: int,
                     best_valid: float) -> None:
        """Commit the full mid-epoch loop state (params + optimizer + batch
        cursor + host/device RNG streams) as the PREEMPT checkpoint.
        Synchronous: the grace window after SIGTERM is short."""
        self.ckpt.save("PREEMPT", {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "epoch": np.asarray(epoch, np.int32),
            "batches_done": np.asarray(batches_done, np.int32),
            "train_iter": np.asarray(train_iter, np.int32),
            "best_valid": np.asarray(best_valid, np.float64),
            "host_rng": pack_rng_state(self.host_rng),
            "key": self.key,
        }, block=True)

    def resume(self) -> int:
        """Resume from the newest checkpoint; returns the epoch index to
        start (0 when nothing to resume). Restores optimizer state - the
        reference cannot do this (SURVEY §5.4).

        A PREEMPT checkpoint (mid-epoch, written on SIGTERM) wins over
        BEST_{n} when it is from a later epoch than any completed one; the
        run then continues the SAME epoch at the saved shuffle position with
        the saved RNG streams (utils/preempt.py)."""
        last = self.ckpt.latest_epoch()
        if self.ckpt.exists("PREEMPT"):
            like = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "epoch": np.asarray(-1, np.int32),
                    "batches_done": np.asarray(-1, np.int32),
                    "train_iter": np.asarray(-1, np.int32),
                    "best_valid": np.asarray(0.0, np.float64),
                    "host_rng": pack_rng_state(self.host_rng),
                    "key": self.key}
            restored = self.ckpt.load("PREEMPT", like=like)
            ep = int(restored["epoch"])
            if last is None or ep > last:
                self.state = self._make_state(restored["params"],
                                              restored["opt_state"])
                self.params = self.state.params
                unpack_rng_state(self.host_rng, restored["host_rng"])
                import jax.numpy as jnp
                self.key = jnp.asarray(restored["key"])
                self._resume_cursor = {
                    "skip_batches": int(restored["batches_done"]),
                    "train_iter": int(restored["train_iter"]),
                    "best_valid": float(restored["best_valid"])}
                print(f"resumed from PREEMPT (epoch {ep}, "
                      f"{int(restored['batches_done'])} batches done)")
                return ep
        if last is None:
            return 0
        restored = self.ckpt.load(
            f"BEST_{last}",
            like={"params": self.state.params,
                  "opt_state": self.state.opt_state,
                  "epoch": np.asarray(-1, np.int32)})
        self.state = self._make_state(restored["params"],
                                      restored["opt_state"])
        self.params = self.state.params
        print(f"resumed from BEST_{last}")
        return last + 1

    # ------------------------------------------------------------------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def train(self, start_epoch: int = 0) -> float:
        cfg = self.cfg
        feeder = Feeder(self.train_set, cfg.train.batch_size, shuffle=True,
                        drop_last=True, seed=cfg.train.seed, mesh=self.mesh,
                        prefetch_depth=cfg.data.prefetch_depth,
                        feats_dtype=self._feats_dtype,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
        n_batches = len(feeder)
        # mid-epoch validation points (reference gqa_ood.py:157)
        val_points = set(np.linspace(0, n_batches, 5, dtype=int)[1:-1].tolist())

        trace_open = False
        if self.profile_steps:
            jax.profiler.start_trace(os.path.join(self.output, "trace"))
            trace_open = True

        if self.preempt is None:
            self.preempt = PreemptionGuard()
        cursor = self._resume_cursor or {}
        self._resume_cursor = None
        start_batch = cursor.get("skip_batches", 0)
        best_valid = cursor.get("best_valid", 0.0)
        train_iter = cursor.get("train_iter", 0)
        # align the feeder's per-epoch shuffle stream with the resumed run
        # and fast-forward past the batches the preempted run consumed
        feeder.set_position(start_epoch, start_batch)
        for epoch in range(start_epoch, cfg.train.epochs):
            # on a PREEMPT-resumed epoch, train_acc covers the remaining
            # batches only (the consumed ones were scored pre-preemption)
            quesid2ans: Dict[object, str] = {}
            t_epoch = time.time()
            offset = start_batch if epoch == start_epoch else 0
            for i, (qids, batch, _mask) in enumerate(feeder, start=offset):
                use_relation = self.host_rng.randint(1, 10) <= cfg.ggm.delta
                step = self.rel_step if use_relation else self.rep_step
                self.state, metrics = step(self.state, batch, self._next_key())

                preds = to_host(metrics["preds"])
                for qid, p in zip(qids, preds[: len(qids)]):
                    quesid2ans[qid] = self.label2ans[int(p)]

                branch_name = "rel" if use_relation else "rep"
                check_step_finite(train_iter, branch_name, metrics)
                self.logger.log_step(train_iter, metrics, branch=branch_name)
                train_iter += 1
                if trace_open and train_iter >= self.profile_steps:
                    jax.profiler.stop_trace()
                    trace_open = False

                if self.preempt.should_save(train_iter):
                    if trace_open:
                        jax.profiler.stop_trace()
                    self.params = self.state.params
                    self.save_preempt(epoch, i + 1, train_iter, best_valid)
                    raise Preempted(
                        f"preempted at epoch {epoch} batch {i + 1}; "
                        f"PREEMPT checkpoint committed to {self.output}")

                if i in val_points and self.valid_set is not None:
                    acc = self.evaluate_valid()
                    self.logger.log_scalar("valid/mid_epoch_acc", acc,
                                           train_iter)
                    if acc > best_valid:
                        best_valid = acc
                        self.save("BEST")

            train_acc = self.train_evaluator.evaluate(quesid2ans) \
                if quesid2ans else 0.0
            log_line = (f"Epoch {epoch}: Train {train_acc * 100.:.2f}")
            if self.valid_set is not None:
                acc = self.evaluate_valid()
                if acc > best_valid:
                    best_valid = acc
                    self.save("BEST", epoch)
                self.save(f"BEST_{epoch}", epoch)
                log_line += (f", Valid {acc * 100.:.2f}"
                             f", Best {best_valid * 100.:.2f}")
            log_line += f" ({time.time() - t_epoch:.1f}s)"
            print(log_line)
            if self.primary:
                with open(os.path.join(self.output, "log.log"), "a") as f:
                    f.write(log_line + "\n")
        if trace_open:  # run shorter than profile_steps: close the trace
            jax.profiler.stop_trace()
        self.ckpt.wait()  # barrier for async background commits
        if self.primary:  # completed run: a PREEMPT cursor would be stale
            self.ckpt.remove("PREEMPT")
        # steps donate their input buffers; refresh the params alias
        self.params = self.state.params
        return best_valid

    def train_baseline(self) -> float:
        """Plain-BCE training loop (reference vqacpv2_baseline.py:152-240):
        one clean step per batch, no GGM phase."""
        cfg = self.cfg
        feeder = Feeder(self.train_set, cfg.train.batch_size, shuffle=True,
                        drop_last=True, seed=cfg.train.seed, mesh=self.mesh,
                        feats_dtype=self._feats_dtype,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
        best_valid, train_iter = 0.0, 0
        for epoch in range(cfg.train.epochs):
            quesid2ans: Dict[object, str] = {}
            for qids, batch, _mask in feeder:
                self.state, metrics = self.clean_step(self.state, batch,
                                                      self._next_key())
                preds = to_host(metrics["preds"])
                for qid, p in zip(qids, preds[: len(qids)]):
                    quesid2ans[qid] = self.label2ans[int(p)]
                check_step_finite(train_iter, "clean", metrics)
                self.logger.log_step(train_iter, metrics, branch="clean")
                train_iter += 1
            train_acc = self.train_evaluator.evaluate(quesid2ans)
            log_line = f"Epoch {epoch}: Train {train_acc * 100.:.2f}"
            if self.valid_set is not None:
                acc = self.evaluate_valid()
                if acc > best_valid:
                    best_valid = acc
                    self.save("BEST", epoch)
                self.save(f"BEST_{epoch}", epoch)
                log_line += (f", Valid {acc * 100.:.2f}"
                             f", Best {best_valid * 100.:.2f}")
            print(log_line)
            if self.primary:
                with open(os.path.join(self.output, "log.log"), "a") as f:
                    f.write(log_line + "\n")
        self.ckpt.wait()  # barrier for async background commits
        self.params = self.state.params
        return best_valid

    def predict(self, dataset: GraphBatchDataset,
                dump_path: Optional[str] = None) -> Dict[object, str]:
        """No-grad prediction (reference gqa_ood.py:379-403): encoder + head
        only; padded batches masked out."""
        feeder = Feeder(dataset, max(self.cfg.train.batch_size, 64),
                        shuffle=False, drop_last=False, mesh=self.mesh,
                        feats_dtype=self._feats_dtype,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
        quesid2ans: Dict[object, str] = {}
        # eval from the bf16 shadow when carried (same bf16 operand values
        # the model would cast to anyway; half the weight-read bytes)
        from xggm_tpu.training.steps import _apply_params
        eval_params = _apply_params(self.state)
        for qids, batch, mask in feeder:
            preds = to_host(self.eval_step(eval_params, batch))
            # the feeder pads trailing rows; preds[:len(qids)] relies on that
            assert bool(np.all(mask[: len(qids)])) and not np.any(
                mask[len(qids):]), "feeder mask must be trailing padding"
            for qid, p in zip(qids, preds[: len(qids)]):
                quesid2ans[qid] = self.label2ans[int(p)]
        if dump_path and self.primary:  # one writer under multi-host
            self.ev_cls.dump_result(quesid2ans, dump_path)
        return quesid2ans

    def evaluate_valid(self) -> float:
        return self.valid_evaluator.evaluate(self.predict(self.valid_set))

    def oracle_score(self) -> float:
        return oracle_score(self.train_set)
