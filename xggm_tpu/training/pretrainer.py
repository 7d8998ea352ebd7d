"""LXMERT pretraining trainer (reference src/pretrain/lxmert_pretrain.py:
221-454): BertAdam warmup 0.05, t_total = steps x epochs (ONE optimizer step
per batch, unlike fine-tuning's two), global-norm clip 1.0, eval by summed
loss, saves Epoch%02d + BEST_EVAL_LOSS."""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xggm_tpu.config import XGGMConfig
from xggm_tpu.data.pretrain_data import PretrainFeaturizer
from xggm_tpu.models.pretrain_model import PretrainModel, LOSSES_NAME
from xggm_tpu.parallel.distributed import host_scalar, to_host
from xggm_tpu.utils.guard import check_step_finite
from xggm_tpu.utils.preempt import (
    Preempted, PreemptionGuard, pack_np_rng_state, unpack_np_rng_state)
from xggm_tpu.training.bert_adam import bert_adam
from xggm_tpu.training.steps import (
    TrainState, _apply_params, _clip_update_apply, _constrain_state,
    bf16_param_shadow)


class LxmertPretrainer:
    def __init__(self, cfg: XGGMConfig, train_feat: PretrainFeaturizer,
                 valid_feat: Optional[PretrainFeaturizer] = None,
                 task_mask_lm: bool = True, task_matched: bool = True,
                 task_obj_predict: bool = True, task_qa: bool = True,
                 visual_losses: Tuple[str, ...] = ("obj", "attr", "feat"),
                 mesh=None):
        self.cfg = cfg
        self.train_feat = train_feat
        self.valid_feat = valid_feat
        self.mesh = mesh
        if cfg.lxmert.pp_stages > 1:
            if mesh is None:
                raise ValueError("pp_stages > 1 requires a device mesh "
                                 "with a 'pipe' axis (make_mesh("
                                 "pipeline_parallel=N))")
            from xggm_tpu.parallel.pipeline_lxmert import set_pipeline_mesh
            set_pipeline_mesh(mesh, axis="pipe", batch_axis="data",
                              n_microbatches=cfg.lxmert.pp_microbatches)
        self.output = cfg.output
        os.makedirs(self.output, exist_ok=True)

        # pallas attention carries custom_partitioning rules
        # (ops/pallas_attention._dim0_partition): the fused kernels
        # partition over any mesh, so no fallback is needed here
        num_answers = train_feat.ds.num_answers
        self.answer_table = train_feat.ds.answer_table
        self.model = PretrainModel(
            cfg.lxmert, num_answers=num_answers, task_mask_lm=task_mask_lm,
            task_matched=task_matched, task_obj_predict=task_obj_predict,
            task_qa=task_qa, visual_losses=visual_losses)

        batch, _ = train_feat.featurize(list(range(2)))
        self.params = self.model.init(
            {"params": jax.random.PRNGKey(cfg.train.seed),
             "dropout": jax.random.PRNGKey(cfg.train.seed + 1)},
            batch["input_ids"], batch["input_mask"], batch["segment_ids"],
            batch["feats"], batch["boxes"])
        self._param_shardings = None
        if mesh is not None:
            # SPMD data(+tensor) parallel pretraining - the reference
            # DataParallels the WHOLE model here (lxmert_pretrain.py:255-256
            # with loss .mean() over device outputs); batches shard on the
            # 'data' axis, wide projections optionally on 'model'
            from xggm_tpu.parallel.mesh import param_shardings

            psh = param_shardings(self.params, mesh)
            self.params = jax.tree.map(jax.device_put, self.params, psh)
            self._param_shardings = psh
        self.primary = jax.process_index() == 0
        if mesh is not None and jax.process_count() > 1:
            # multi-host: every process featurizes the same global batch
            # (identical rng stream) but ships only its contiguous slice
            from xggm_tpu.parallel.distributed import (
                local_batch_to_global, process_slice)
            pidx, pcount = jax.process_index(), jax.process_count()

            def _put(b):
                n = jax.tree.leaves(b)[0].shape[0]
                # process_slice is a basic (zero-copy) leading-dim slice
                return local_batch_to_global(
                    mesh,
                    jax.tree.map(lambda x: process_slice(x, pidx, pcount), b),
                    n)
            self._put = _put
        elif mesh is not None:
            from xggm_tpu.parallel.mesh import shard_batch
            self._put = lambda b: shard_batch(mesh, b)
        else:
            self._put = jax.device_put

        # with gradient accumulation, the schedule ticks once per OPTIMIZER
        # step (one per accum_steps microbatches), so t_total counts those
        self.accum = max(1, int(cfg.train.accum_steps))
        steps_per_epoch = (len(train_feat) // cfg.train.batch_size
                           // self.accum)
        t_total = int(steps_per_epoch * cfg.train.epochs)
        self.tx = bert_adam(lr=cfg.train.lr, warmup=0.05, t_total=t_total,
                            weight_decay=cfg.train.weight_decay)
        self.state = self._make_state(self.params)
        self.key = jax.random.PRNGKey(cfg.train.seed)

        model = self.model

        def loss_fn(params, batch, dropout_key):
            total, losses, ans_logits = model.apply(
                params, batch, deterministic=False,
                rngs={"dropout": dropout_key},
                method=PretrainModel.compute_losses)
            return total, (losses, ans_logits)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, key):
            # fwd/bwd from the bf16 shadow when present (steps._apply_params;
            # masters stay fp32 for BertAdam); global-norm clip 1.0 + one
            # optimizer step + shadow refresh via steps._clip_update_apply
            (total, (losses, ans_logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(_apply_params(state), batch, key)
            state = _clip_update_apply(self.tx, grads, state, 1.0)
            state = _constrain_state(state, self._state_shardings)
            return state, total, losses, jnp.argmax(ans_logits, axis=-1)

        @jax.jit
        def valid_step(params, batch):
            total, losses, ans_logits = model.apply(
                params, batch, deterministic=True,
                method=PretrainModel.compute_losses)
            return total, losses, jnp.argmax(ans_logits, axis=-1)

        # gradient-accumulation pair (cfg.train.accum_steps > 1): grad_step
        # folds one microbatch's fp32 grads into a donated accumulator;
        # apply_step runs clip+BertAdam(+shadow refresh) on the mean. Each
        # microbatch stays an ordinary P('data') batch, so the same code
        # serves single-chip, SPMD mesh, and multi-host feeding.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def grad_step(acc, params, batch, key):
            (total, (losses, ans_logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, key)
            acc = jax.tree.map(lambda a, g: a + g.astype(a.dtype),
                               acc, grads)
            return acc, total, losses, jnp.argmax(ans_logits, axis=-1)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def apply_step(state: TrainState, acc):
            grads = jax.tree.map(lambda a: a / self.accum, acc)
            state = _clip_update_apply(self.tx, grads, state, 1.0)
            return _constrain_state(state, self._state_shardings)

        @jax.jit
        def zero_acc(params):
            # fp32 accumulator over the APPLIED tree (bf16 shadow leaves
            # produce bf16 cotangents; accumulate them in fp32)
            return jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)

        self.train_step = train_step
        self.grad_step = grad_step
        self.apply_step = apply_step
        self.zero_acc = zero_acc
        self.valid_step = valid_step
        self.task_qa = task_qa
        # per-epoch QA accuracy over the collected uid->answer predictions
        # (reference lxmert_pretrain.py:369-370 train, :406-407 valid)
        from xggm_tpu.data.pretrain_data import LxmertPretrainEvaluator
        self.train_evaluator = (LxmertPretrainEvaluator(train_feat.ds)
                                if task_qa else None)
        self.valid_evaluator = (
            LxmertPretrainEvaluator(valid_feat.ds)
            if task_qa and valid_feat is not None else None)

        from xggm_tpu.checkpoint.manager import CheckpointManager
        self.ckpt = CheckpointManager(self.output)
        # Preemption guard (utils/preempt.py): installed lazily in train()
        self.preempt: Optional[PreemptionGuard] = None
        self._resume_cursor: Optional[Dict[str, object]] = None

    def _make_state(self, params, opt_state=None) -> TrainState:
        """Fresh TrainState: fp32 masters + (with bf16 compute) the bf16
        param shadow the steps read from (steps.bf16_param_shadow). With
        cfg.train.shard_opt_state the state lands in its ZeRO layout
        (parallel/mesh.zero_state_shardings) and self._state_shardings pins
        it through the jitted steps."""
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

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _batches(self, feat: PretrainFeaturizer, bs: int, shuffle: bool,
                 rng: np.random.RandomState, skip: int = 0):
        """skip > 0 (preemption resume): drop the first `skip` batches of the
        epoch WITHOUT featurizing them - the featurizer's masking RNG was
        checkpointed mid-epoch, so replaying those calls would desync it."""
        order = np.arange(len(feat))
        if shuffle:
            rng.shuffle(order)
        stop = (len(feat) // bs) * bs
        for j, s in enumerate(range(0, stop, bs)):
            if j < skip:
                continue
            yield feat.featurize(order[s: s + bs].tolist())

    def train(self, start_epoch: int = 0) -> float:
        cfg = self.cfg
        rng = np.random.RandomState(cfg.train.seed)
        bs = cfg.train.batch_size
        if self.preempt is None:
            self.preempt = PreemptionGuard()
        cursor = self._resume_cursor or {}
        self._resume_cursor = None
        opt_steps = int(cursor.get("opt_steps", 0))
        best_eval_loss = float(cursor.get("best", float("inf")))
        for epoch in range(start_epoch, cfg.train.epochs):
            skip = int(cursor.get("skip", 0)) if epoch == start_epoch else 0
            if skip and cursor.get("loop_rng0") is not None:
                # shuffle stream as of the preempted epoch's start: _batches
                # regenerates the SAME order, then drops the consumed prefix
                unpack_np_rng_state(rng, cursor["loop_rng0"])
            epoch_rng0 = pack_np_rng_state(rng)
            total_loss = 0.0
            sums: Dict[str, float] = {}
            uid2ans = {}  # on a resumed epoch: remaining batches only
            n, n_proc = skip, 0
            acc, micro = None, 0
            n_micro = len(self.train_feat) // bs
            n_micro -= n_micro % self.accum  # whole accumulation groups
            for batch, uids in self._batches(self.train_feat, bs, True, rng,
                                             skip=skip):
                if n >= n_micro:
                    break  # trailing partial group: dropped, like the
                    # partial trailing batch in _batches
                batch = self._put(batch)
                if self.accum == 1:
                    self.state, loss, losses, preds = self.train_step(
                        self.state, batch, self._next_key())
                else:
                    params = _apply_params(self.state)
                    if acc is None:
                        acc = self.zero_acc(params)
                    acc, loss, losses, preds = self.grad_step(
                        acc, params, batch, self._next_key())
                    micro += 1
                    if micro == self.accum:
                        self.state = self.apply_step(self.state, acc)
                        acc, micro = None, 0
                check_step_finite(n, "pretrain", {"loss": loss, **losses})
                total_loss += host_scalar(loss)
                for k, v in losses.items():
                    sums[k] = sums.get(k, 0.0) + host_scalar(v)
                if self.task_qa:
                    for uid, p in zip(uids, to_host(preds)):
                        uid2ans[uid] = self.answer_table.id2ans(int(p))
                n += 1
                n_proc += 1
                if micro == 0:
                    # accumulation-group boundary = a consistent optimizer
                    # state; the only place a preemption save is coherent
                    opt_steps += 1
                    if self.preempt.should_save(opt_steps):
                        self.save_preempt(epoch, n, opt_steps,
                                          best_eval_loss, epoch_rng0)
                        raise Preempted(
                            f"preempted at epoch {epoch} batch {n}; "
                            f"PREEMPT checkpoint committed to {self.output}")
            line = (f"Epoch {epoch}: train loss "
                    f"{total_loss / max(n_proc, 1):.4f} "
                    + " ".join(f"{k}: {sums.get(k, 0.) / max(n_proc, 1):.4f}"
                               for k in LOSSES_NAME if k in sums))
            if self.train_evaluator is not None:
                accu, dset_acc = self.train_evaluator.evaluate(uid2ans)
                line += (f"\ntrain QA accuracy: {accu:.4f}"
                         + "".join(f" {d}: {a:.4f}"
                                   for d, a in sorted(dset_acc.items())))
            print(line)
            if self.primary:
                with open(os.path.join(self.output, "log.log"), "a") as f:
                    f.write(line + "\n")

            if self.valid_feat is not None:
                eval_loss = self.evaluate_epoch()
                if eval_loss < best_eval_loss:
                    best_eval_loss = eval_loss
                    self.save("BEST_EVAL_LOSS")
            self.save(f"Epoch{epoch + 1:02d}")
        self.ckpt.wait()  # barrier for async background commits
        if self.primary:  # completed run: a PREEMPT cursor would be stale
            self.ckpt.remove("PREEMPT")
        return best_eval_loss

    def save_preempt(self, epoch: int, batches_done: int, opt_steps: int,
                     best_eval_loss: float, loop_rng0: np.ndarray) -> None:
        """Commit the full mid-epoch loop state on an eviction notice:
        params + optimizer + batch cursor + BOTH host RNG streams (the
        epoch-shuffle RandomState as of epoch start, and the featurizer's
        masking RandomState as of now) + the device PRNG key. Synchronous."""
        self.ckpt.save("PREEMPT", {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "epoch": np.asarray(epoch, np.int32),
            "batches_done": np.asarray(batches_done, np.int32),
            "opt_steps": np.asarray(opt_steps, np.int32),
            "best_eval_loss": np.asarray(best_eval_loss, np.float64),
            "loop_rng0": np.asarray(loop_rng0),
            "feat_rng": pack_np_rng_state(self.train_feat.rng),
            "key": self.key,
        }, block=True)

    def resume(self) -> int:
        """Resume from a PREEMPT checkpoint if present: restores params,
        optimizer, RNG streams and the mid-epoch cursor; returns the epoch
        to continue (0 when nothing to resume). Epoch-level restarts keep
        using --load Epoch{N:02d} as before."""
        if not self.ckpt.exists("PREEMPT"):
            return 0
        import jax.numpy as jnp2  # local: avoid shadowing module jnp

        like = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "epoch": np.asarray(-1, np.int32),
                "batches_done": np.asarray(-1, np.int32),
                "opt_steps": np.asarray(-1, np.int32),
                "best_eval_loss": np.asarray(0.0, np.float64),
                "loop_rng0": pack_np_rng_state(np.random.RandomState(0)),
                "feat_rng": pack_np_rng_state(np.random.RandomState(0)),
                "key": self.key}
        restored = self.ckpt.load("PREEMPT", like=like)
        self.state = self._make_state(restored["params"],
                                      restored["opt_state"])
        self.params = self.state.params
        unpack_np_rng_state(self.train_feat.rng, restored["feat_rng"])
        self.key = jnp2.asarray(restored["key"])
        ep = int(restored["epoch"])
        self._resume_cursor = {
            "skip": int(restored["batches_done"]),
            "opt_steps": int(restored["opt_steps"]),
            "best": float(restored["best_eval_loss"]),
            "loop_rng0": np.asarray(restored["loop_rng0"])}
        print(f"resumed from PREEMPT (epoch {ep}, "
              f"{int(restored['batches_done'])} batches done)")
        return ep

    def evaluate_epoch(self) -> float:
        bs = self.cfg.train.batch_size
        total, n = 0.0, 0
        uid2ans = {}
        for batch, uids in self._batches(self.valid_feat, bs, False,
                                         np.random.RandomState(0)):
            loss, _, preds = self.valid_step(_apply_params(self.state),
                                             self._put(batch))
            total += host_scalar(loss)
            if self.valid_evaluator is not None:
                for uid, p in zip(uids, to_host(preds)):
                    uid2ans[uid] = self.answer_table.id2ans(int(p))
            n += 1
        avg = total / max(n, 1)
        line = f"valid loss {avg:.4f}"
        if self.valid_evaluator is not None:
            accu, dset_acc = self.valid_evaluator.evaluate(uid2ans)
            line += (f"\nvalid QA accuracy: {accu:.4f}"
                     + "".join(f" {d}: {a:.4f}"
                               for d, a in sorted(dset_acc.items())))
        print(line)
        return avg

    def save(self, name: str) -> None:
        self.ckpt.save(name, {"params": self.state.params,
                              "opt_state": self.state.opt_state})
