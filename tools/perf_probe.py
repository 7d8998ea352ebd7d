"""Step-time breakdown probe on the real TPU chip.

Times isolated pieces of the flagship two-phase train step to locate the
next optimization target. Every timing ends with a host readback (the only
reliable barrier through the axon relay). Results print as one JSON dict.

Variants:
  step        : full two-phase step (the bench number)
  step_det    : dropout disabled -> upper bound of PRNG+dropout-mask cost
  step_rbg    : threefry -> rbg PRNG swap (cheaper per-block bits)
  grads_ggm   : value_and_grad of the GGM phase only (no optimizer)
  grads_clean : value_and_grad of the clean phase only
  fwd_clean   : clean forward only
  opt_only    : clip + BertAdam update on captured grads

Run: python tools/perf_probe.py [--variants step,step_det,...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def timed(fn, *args, iters=20, sync=None):
    out = fn(*args)
    (sync or (lambda o: float(np.asarray(o).ravel()[0])))(out)  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (sync or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="step,step_det,grads_ggm,"
                    "grads_clean,fwd_clean,opt_only")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bs", type=int, default=96)
    ap.add_argument("--prng", default=None,
                    help="jax_default_prng_impl override (e.g. rbg)")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused Pallas BertAdam step")
    ap.add_argument("--flat", action="store_true",
                    help="use the flat single-buffer BertAdam state")
    ap.add_argument("--pallas_group", type=int, default=None,
                    help="override ops.pallas_attention.DEFAULT_GROUP")
    ap.add_argument("--jnp_fused", action="store_true",
                    help="single-traversal jnp clip+update+apply")
    ap.add_argument("--no_pallas", action="store_true",
                    help="disable the Pallas attention kernels (XLA path)")
    ap.add_argument("--bf16_params", type=int, default=1,
                    help="carry the bf16 param shadow in the step variant "
                         "(the production layout); 0 to bisect")
    ap.add_argument("--stacked", action="store_true",
                    help="probe the rejected scan-over-layers stacked "
                         "params opt-in instead of the shipped per-layer "
                         "default")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder-layer activations "
                         "(config.lxmert.remat) - memory-for-FLOPs knob")
    ap.add_argument("--compiler_opts", default=None,
                    help="comma-separated k=v XLA compiler options applied "
                         "to the 'step' variant via lower().compile(), e.g. "
                         "xla_tpu_scoped_vmem_limit_kib=65536")
    args = ap.parse_args()
    variants = args.variants.split(",")

    import jax
    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)
    if args.pallas_group:
        from xggm_tpu.ops import pallas_attention
        pallas_attention.DEFAULT_GROUP = args.pallas_group
    import jax.numpy as jnp
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    from xggm_tpu.config import gqa_ood_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import (
        TrainState, _batch_args, _clip_update_apply, bf16_param_shadow,
        make_ggm_train_step)
    from xggm_tpu.ops.losses import bce_with_logits
    from __graft_entry__ import _make_batch

    cfg = gqa_ood_config()
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(
        dtype="bfloat16",
        stacked_layers=args.stacked,
        remat=args.remat,
        bert=dataclasses.replace(cfg.lxmert.bert,
                                 use_pallas_attention=not args.no_pallas)))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, args.bs, cfg.lxmert.bert.vocab_size,
                        cfg.lxmert.visual.visual_feat_dim, cfg.num_answers)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    # downstream params at 4x the encoder lr (reference gqa_ood.py:122-133)
    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    tx = bert_adam(lr=4 * 5e-6, warmup=0.1, t_total=10_000, lr_scale=scales,
                   fused=args.fused, flat=args.flat, jnp_fused=args.jnp_fused)
    batch = jax.device_put(batch)
    # donated steps delete their input buffers: keep a host copy and
    # re-materialize fresh device params for every variant
    params_host = jax.tree.map(np.asarray, params)

    def fresh_params():
        return jax.tree.map(jnp.asarray, params_host)

    results = {}

    def sync_state(out):
        s, m = out
        return float(np.asarray(jax.tree.leaves(m)[0]).ravel()[0])

    if "step" in variants or "step_rbg" in variants:
        step = make_ggm_train_step(model, tx, cfg.train, "relation")

    if "step" in variants:
        params = fresh_params()
        st = TrainState(params, tx.init(params),
                        bf16_param_shadow(params)
                        if args.bf16_params else None)
        if args.compiler_opts:
            opts = dict(kv.split("=", 1)
                        for kv in args.compiler_opts.split(","))
            step = step.lower(st, batch, jax.random.PRNGKey(0)).compile(
                compiler_options=opts)
        # non-donating timing loop: feed back the result
        out = step(st, batch, jax.random.PRNGKey(0))
        sync_state(out)
        st = out[0]
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = step(st, batch, jax.random.PRNGKey(i))
        sync_state((st, m))
        results["step"] = (time.perf_counter() - t0) / args.iters

    if "step_det" in variants:
        # dropout off: deterministic phases but same optimizer work
        def det_losses():
            num_ans = model.num_answers

            def ggm_loss(p, b, nk):
                logits, adj_gen, grad_log, adj_true = model.apply(
                    p, *_batch_args(b), b["adj"], nk, deterministic=True,
                    method=XGGMModel.relation_branch)
                from xggm_tpu.ops.losses import (
                    score_matching_loss, symmetric_kl)
                d_loss = symmetric_kl(adj_gen, adj_true) * num_ans
                lg = score_matching_loss(adj_gen, grad_log, model.ggm.sigma)
                return (bce_with_logits(logits, b["target"]) * num_ans
                        + cfg.train.rel_sm_mult
                        * (cfg.train.rel_d_mult * d_loss + lg))

            def clean_loss(p, b):
                logits = model.apply(p, *_batch_args(b), deterministic=True,
                                     method=XGGMModel.clean_forward)
                return bce_with_logits(logits, b["target"]) * num_ans

            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def det_step(state, b, key):
                loss1, grads = jax.value_and_grad(ggm_loss)(
                    state.params, b, key)
                state = _clip_update_apply(tx, grads, state,
                                           cfg.train.grad_clip)
                loss2, grads = jax.value_and_grad(clean_loss)(state.params, b)
                state = _clip_update_apply(tx, grads, state,
                                           cfg.train.grad_clip)
                return state, {"l1": loss1, "l2": loss2}
            return det_step

        det_step = det_losses()
        params = fresh_params()
        st = TrainState(params, tx.init(params))
        out = det_step(st, batch, jax.random.PRNGKey(0))
        sync_state(out)
        st = out[0]
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = det_step(st, batch, jax.random.PRNGKey(i))
        sync_state((st, m))
        results["step_det"] = (time.perf_counter() - t0) / args.iters

    if "grads_ggm" in variants or "grads_clean" in variants \
            or "opt_only" in variants:
        params = fresh_params()
        num_ans = model.num_answers

        def ggm_loss(p, b, dk, nk):
            from xggm_tpu.ops.losses import score_matching_loss, symmetric_kl
            logits, adj_gen, grad_log, adj_true = model.apply(
                p, *_batch_args(b), b["adj"], nk, deterministic=False,
                rngs={"dropout": dk}, method=XGGMModel.relation_branch)
            d_loss = symmetric_kl(adj_gen, adj_true) * num_ans
            lg = score_matching_loss(adj_gen, grad_log, model.ggm.sigma)
            return (bce_with_logits(logits, b["target"]) * num_ans
                    + cfg.train.rel_sm_mult
                    * (cfg.train.rel_d_mult * d_loss + lg))

        def clean_loss(p, b, dk):
            logits = model.apply(p, *_batch_args(b), deterministic=False,
                                 rngs={"dropout": dk},
                                 method=XGGMModel.clean_forward)
            return bce_with_logits(logits, b["target"]) * num_ans

        ggm_grads = jax.jit(lambda p, b, k: jax.value_and_grad(ggm_loss)(
            p, b, *jax.random.split(k)))
        clean_grads = jax.jit(
            lambda p, b, k: jax.value_and_grad(clean_loss)(p, b, k))

        def sync_grads(out):
            return float(np.asarray(out[0]))

        if "grads_ggm" in variants:
            results["grads_ggm"] = timed(
                ggm_grads, params, batch, jax.random.PRNGKey(0),
                iters=args.iters, sync=sync_grads)
        if "grads_clean" in variants:
            results["grads_clean"] = timed(
                clean_grads, params, batch, jax.random.PRNGKey(0),
                iters=args.iters, sync=sync_grads)
        if "opt_only" in variants:
            _, grads = clean_grads(params, batch, jax.random.PRNGKey(0))

            @jax.jit
            def opt_step(state, grads):
                return _clip_update_apply(tx, grads, state,
                                          cfg.train.grad_clip)

            st = TrainState(params, tx.init(params))

            def sync_opt(out):
                return float(np.asarray(out.opt_state.count))
            results["opt_only"] = timed(opt_step, st, grads,
                                        iters=args.iters, sync=sync_opt)

    if "step_scan8" in variants:
        # K two-phase steps inside ONE jit via lax.scan: a single dispatch
        # round trip per K steps (the axon relay costs ~70 ms per dispatch;
        # device compute is ~18 ms/step)
        from xggm_tpu.ops.losses import score_matching_loss, symmetric_kl
        num_ans = model.num_answers

        def ggm_loss(p, b, dk, nk):
            logits, adj_gen, grad_log, adj_true = model.apply(
                p, *_batch_args(b), b["adj"], nk, deterministic=False,
                rngs={"dropout": dk}, method=XGGMModel.relation_branch)
            d_loss = symmetric_kl(adj_gen, adj_true) * num_ans
            lg = score_matching_loss(adj_gen, grad_log, model.ggm.sigma)
            return (bce_with_logits(logits, b["target"]) * num_ans
                    + cfg.train.rel_sm_mult
                    * (cfg.train.rel_d_mult * d_loss + lg))

        def clean_loss(p, b, dk):
            logits = model.apply(p, *_batch_args(b), deterministic=False,
                                 rngs={"dropout": dk},
                                 method=XGGMModel.clean_forward)
            return bce_with_logits(logits, b["target"]) * num_ans

        def body(state, key):
            kg, kc = jax.random.split(key)
            dk, nk = jax.random.split(kg)
            l1, grads = jax.value_and_grad(ggm_loss)(state.params, batch,
                                                     dk, nk)
            state = _clip_update_apply(tx, grads, state, cfg.train.grad_clip)
            l2, grads = jax.value_and_grad(clean_loss)(state.params, batch,
                                                       kc)
            state = _clip_update_apply(tx, grads, state, cfg.train.grad_clip)
            return state, l2

        import functools
        K = 8

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi(state, keys):
            return jax.lax.scan(body, state, keys)

        params = fresh_params()
        st = TrainState(params, tx.init(params))
        keys = jax.random.split(jax.random.PRNGKey(0), K)
        st, ls = multi(st, keys)
        float(np.asarray(ls)[-1])
        t0 = time.perf_counter()
        reps = max(2, args.iters // K)
        for i in range(reps):
            st, ls = multi(st, jax.random.split(jax.random.PRNGKey(i), K))
        float(np.asarray(ls)[-1])
        results["step_scan8"] = (time.perf_counter() - t0) / (reps * K)

    if "step_bf16p" in variants:
        # bf16 params CARRIED ACROSS steps: fwd/bwd read half the weight
        # bytes (today each GEMM re-reads fp32 master with the convert
        # fused into the read). Numerically identical activations - the
        # model already casts every fp32 param to bf16 at use - but grads
        # become bf16 cotangents, upcast (fused into the dW epilogue)
        # before the unchanged fp32 BertAdam. Cost: one bf16 param-copy
        # write after each of the two optimizer updates.
        from xggm_tpu.ops.losses import score_matching_loss, symmetric_kl
        num_ans = model.num_answers

        def ggm_loss(pb, b, dk, nk):
            logits, adj_gen, grad_log, adj_true = model.apply(
                pb, *_batch_args(b), b["adj"], nk, deterministic=False,
                rngs={"dropout": dk}, method=XGGMModel.relation_branch)
            d_loss = symmetric_kl(adj_gen, adj_true) * num_ans
            lg = score_matching_loss(adj_gen, grad_log, model.ggm.sigma)
            return (bce_with_logits(logits, b["target"]) * num_ans
                    + cfg.train.rel_sm_mult
                    * (cfg.train.rel_d_mult * d_loss + lg))

        def clean_loss(pb, b, dk):
            logits = model.apply(pb, *_batch_args(b), deterministic=False,
                                 rngs={"dropout": dk},
                                 method=XGGMModel.clean_forward)
            return bce_with_logits(logits, b["target"]) * num_ans

        def cast_bf16(p):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, p)

        def upcast(g):
            return jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.bfloat16 else x, g)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def bf16_step(carry, b, key):
            params, pb, opt = carry
            kg, kc = jax.random.split(key)
            dk, nk = jax.random.split(kg)
            l1, grads = jax.value_and_grad(ggm_loss)(pb, b, dk, nk)
            ts = _clip_update_apply(tx, upcast(grads),
                                    TrainState(params, opt),
                                    cfg.train.grad_clip)
            pb = cast_bf16(ts.params)
            l2, grads = jax.value_and_grad(clean_loss)(pb, b, kc)
            ts = _clip_update_apply(tx, upcast(grads), ts,
                                    cfg.train.grad_clip)
            pb = cast_bf16(ts.params)
            return (ts.params, pb, ts.opt_state), {"l1": l1, "l2": l2}

        params = fresh_params()
        carry = (params, cast_bf16(params), tx.init(params))
        out = bf16_step(carry, batch, jax.random.PRNGKey(0))
        sync_state(out)
        carry = out[0]
        t0 = time.perf_counter()
        for i in range(args.iters):
            carry, m = bf16_step(carry, batch, jax.random.PRNGKey(i))
        sync_state((carry, m))
        results["step_bf16p"] = (time.perf_counter() - t0) / args.iters

    if "fwd_clean" in variants:
        params = fresh_params()
        fwd = jax.jit(lambda p, b: model.apply(
            p, *_batch_args(b), deterministic=True,
            method=XGGMModel.clean_forward))

        def sync_fwd(out):
            return float(np.asarray(out[0, 0]))
        results["fwd_clean"] = timed(fwd, params, batch,
                                     iters=args.iters, sync=sync_fwd)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()},
                     indent=2))


if __name__ == "__main__":
    main()
