"""Composed two-phase train-step trajectory parity vs the reference loop.

Drives the reference PyTorch training loop body (src/gqa/gqa_ood.py:165-289
and src/vqa/vqacpv2.py:165-260) for several steps on fixed data with the
noise draws recorded, then replays the SAME weights, data, and noise through
our jitted two-phase train step and asserts the loss sequences match. This
pins the full composition: branch math, loss multipliers, grad clip 5.0,
BertAdam schedule/groups, and the two-optimizer-steps-per-batch structure.

Stochastic layers (dropout) are disabled on both sides (torch .eval(), our
config with zero dropout probabilities) - the trajectories are otherwise the
real training computation. Encoder depth is reduced to 2/1/1 (hidden stays
768 - the reference GQAModel hardwires it) to keep runtime sane; every layer
type is still exercised.

The torch-side products (initial state dict, loss sequences, noise draws)
are deterministic, so they are disk-cached via tests/ref_cache.py - any
edit to this file or tools/make_goldens.py re-runs the reference live;
`rm -rf tests/.ref_cache` forces a full reproduction.
"""
import os
import sys

import numpy as np
import pytest

REF = os.environ.get("XGGM_REFERENCE_PATH", "/root/reference")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

from ref_cache import cached  # noqa: E402  (torch products disk cache)

_HERE = os.path.dirname(os.path.abspath(__file__))
# make_goldens must be importable even on fully-warm cache runs (where
# _build_ref_model - which also prepends this path - never executes)
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tools"))
# Every source file the torch-side derivation flows through: editing any of
# them invalidates the cached reference products and re-runs torch live.
_DEPS = (os.path.abspath(__file__),
         os.path.join(os.path.dirname(_HERE), "tools", "make_goldens.py"))

BS, NUM_ANS, SEQ, NOBJ, HID = 4, 32, 20, 36, 768
L_LAYERS, X_LAYERS, R_LAYERS = 2, 1, 1
SIGMA = 1.0
LR = 1e-4
T_TOTAL = 20
N_STEPS = 5
BRANCH_PLAN = ["relation", "representation", "relation", "representation",
               "relation"]


def _make_np_batches(n):
    rng = np.random.RandomState(42)
    batches = []
    for _ in range(n):
        adj = rng.rand(BS, NOBJ, NOBJ).astype(np.float32)
        adj = (adj + adj.transpose(0, 2, 1)) / 2
        mask = np.ones((BS, SEQ), np.int64)
        mask[:, 13:] = 0
        target = np.zeros((BS, NUM_ANS), np.float32)
        target[np.arange(BS), rng.randint(0, NUM_ANS, BS)] = 1.0
        batches.append({
            "input_ids": rng.randint(1, 30522, (BS, SEQ)).astype(np.int64),
            "input_mask": mask,
            "segment_ids": np.zeros((BS, SEQ), np.int64),
            "feats": rng.randn(BS, NOBJ, 2048).astype(np.float32),
            "boxes": rng.rand(BS, NOBJ, 4).astype(np.float32),
            "adj": adj, "target": target,
        })
    return batches


def _build_ref_model():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from make_goldens import setup_reference
    sys.argv = ["gqa_ood.py", "--llayers", str(L_LAYERS),
                "--xlayers", str(X_LAYERS), "--rlayers", str(R_LAYERS),
                "--gnn", "GCN", "--num_layer", "2", "--sigma", str(SIGMA),
                "--tf_writer", "False"]
    setup_reference()

    import torch

    import lxrt.modeling as M
    import lxrt.tokenization as T
    import param
    # param.args may already be parsed by an earlier test with other argv
    param.args.llayers, param.args.xlayers, param.args.rlayers = (
        L_LAYERS, X_LAYERS, R_LAYERS)
    param.args.from_scratch = False

    vocab_path = os.path.join(os.path.dirname(__file__), "goldens",
                              "_baseline_vocab.txt")
    if not os.path.exists(vocab_path):
        from xggm_tpu.data.synthetic import write_vocab
        write_vocab(vocab_path)
    T.BertTokenizer.from_pretrained = classmethod(
        lambda cls, name, **kw: cls(vocab_path))

    def local_from_pretrained(cls, name, *inputs, **kwargs):
        cfg = M.BertConfig(vocab_size_or_config_json_file=30522,
                           hidden_size=HID, num_hidden_layers=12,
                           num_attention_heads=12, intermediate_size=3072)
        return cls(cfg, *inputs, **kwargs)

    M.LXRTFeatureExtraction.from_pretrained = classmethod(
        local_from_pretrained)

    from gqa.gqa_ood_model import GQAModel
    torch.manual_seed(0)
    model = GQAModel(NUM_ANS, gnn="GCN", n_layers=2)
    model.eval()  # dropout off; grads still flow
    return model


def _torch_trajectory(model, batches, ordering):
    """Replay the reference loop body N_STEPS times, recording noise draws
    and the loss sequence. ordering: 'ggm_first' (GQA) or 'clean_first'
    (VQA, with the VQA multipliers)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from lxrt.optimization import BertAdam
    from module.graph_utils import add_edge_noise_v2, add_feature_noise_v2

    base_ids = list(map(id, model.lxrt_encoder.parameters()))
    down = [p for p in model.parameters() if id(p) not in base_ids]
    optim = BertAdam(
        [{"params": down},
         {"params": model.lxrt_encoder.parameters(), "lr": LR}],
        lr=4 * LR, warmup=0.1, t_total=T_TOTAL)
    bce_loss = nn.BCEWithLogitsLoss()

    def compute_kl_loss(x, y):
        px, log_px = F.softmax(x, -1), F.log_softmax(x, -1)
        py, log_py = F.softmax(y, -1), F.log_softmax(y, -1)
        return (F.kl_div(log_px, py, reduction="none")
                + F.kl_div(log_py, px, reduction="none")).mean()

    def loss_func(score, grad_log, sigma):
        cur = 0.5 * sigma ** 2 * (
            (score - grad_log) ** 2).sum(dim=[-1, -2]).mean()
        return cur / (score.shape[-1] * score.shape[-2])

    if ordering == "ggm_first":   # GQA multipliers (gqa_ood.py:192-276)
        rel_d, rel_sm = 12.0, 6.0
    else:                          # VQA multipliers (vqacpv2.py:205-250)
        rel_d, rel_sm = 8.0, 6.0
    rep_d, rep_grad, rep_sm = 0.15, 6.0, 1.1

    def encoder_fwd(b):
        feat_seq, x = model.lxrt_encoder.model(
            torch.from_numpy(b["input_ids"]),
            torch.from_numpy(b["segment_ids"]),
            torch.from_numpy(b["input_mask"]),
            visual_feats=(torch.from_numpy(b["feats"]),
                          torch.from_numpy(b["boxes"])))
        return feat_seq, x

    def ggm_phase(b, branch, rec):
        model.zero_grad(set_to_none=False)
        optim.zero_grad(set_to_none=False)
        target = torch.from_numpy(b["target"])
        feat_seq, x = encoder_fwd(b)
        adj_true = torch.from_numpy(b["adj"])
        adj_true = adj_true.triu(1) + adj_true.tril(-1)
        if branch == "relation":
            adj_noise = torch.zeros_like(adj_true)
            adj_temp = torch.ones_like(adj_true).triu(1)
            adj_noise[adj_temp == 1] = model.encoder_adj(x).view(-1)
            adj_noise = adj_noise + adj_noise.transpose(1, 2)
            pre = adj_noise.detach().clone()
            adj_noise, grad_log = add_edge_noise_v2(adj_noise, sigma=SIGMA)
            rec["noise"] = (adj_noise - pre).detach().numpy()
            node_feats, adj_gen = model.generator(feat_seq[1], adj_noise)
            d_loss = compute_kl_loss(adj_gen, adj_true) * target.size(1)
            loss_sm = rel_d * d_loss + loss_func(adj_gen, grad_log, SIGMA)
            sm_mult = rel_sm
        else:
            node_feats = x.unsqueeze(1).repeat(1, NOBJ, 1)
            node_feats = model.node_fc(node_feats)
            pre = node_feats.detach().clone()
            node_feats, feat_grad = add_feature_noise_v2(node_feats,
                                                         sigma=SIGMA)
            rec["noise"] = (node_feats - pre).detach().numpy()
            node_feats, _ = model.generator(node_feats, adj_true)
            d_loss = compute_kl_loss(node_feats, feat_seq[1]) * target.size(1)
            loss_sm = rep_d * d_loss + rep_grad * loss_func(
                node_feats, feat_grad, SIGMA)
            sm_mult = rep_sm
        x_gen = model.fusion_fc(
            torch.cat([x, torch.tanh(node_feats.mean(1))], dim=-1))
        logit = model.logit_fc(x_gen)
        loss = bce_loss(logit, target) * logit.size(1) + sm_mult * loss_sm
        loss.backward()
        nn.utils.clip_grad_norm_(model.parameters(), 5.)
        optim.step()
        rec["ggm_loss"] = float(loss.detach())
        rec["d_loss"] = float(d_loss.detach())

    def clean_phase(b, rec):
        optim.zero_grad(set_to_none=False)
        model.zero_grad(set_to_none=False)
        target = torch.from_numpy(b["target"])
        _, x = encoder_fwd(b)
        logit = model.logit_fc(x)
        loss = bce_loss(logit, target) * target.size(1)
        loss.backward()
        nn.utils.clip_grad_norm_(model.parameters(), 5.)
        optim.step()
        rec["clean_loss"] = float(loss.detach())

    records = []
    for i in range(N_STEPS):
        b = batches[i % len(batches)]
        rec = {}
        if ordering == "ggm_first":
            ggm_phase(b, BRANCH_PLAN[i], rec)
            clean_phase(b, rec)
        else:
            clean_phase(b, rec)
            ggm_phase(b, BRANCH_PLAN[i], rec)
        records.append(rec)
    return records


class _RefSetup:
    """Lazy handle on the reduced-depth reference model: the torch model is
    only BUILT when a cache miss actually needs it (sd0 and the trajectory
    records are served from tests/.ref_cache on warm runs)."""

    def __init__(self):
        self._model = None

    def fresh_model(self):
        """A pristine (seed-0) reference model; safe to mutate via
        deepcopy at call sites."""
        if self._model is None:
            self._model = _build_ref_model()
        return self._model

    @property
    def sd0(self):
        from make_goldens import flat_sd
        return cached(
            "refsetup_sd0",
            dict(depth=(L_LAYERS, X_LAYERS, R_LAYERS), hid=HID,
                 num_ans=NUM_ANS),
            lambda: flat_sd(self.fresh_model()),  # BEFORE any optim step
            depends_on=_DEPS)


@pytest.fixture(scope="module")
def ref_setup():
    return _RefSetup()


@pytest.mark.parametrize("ordering,n_steps",
                         [("ggm_first", 6), ("clean_first", 3)])
def test_full_depth_trajectory_parity(ordering, n_steps):
    """Trajectory pin at the SHIPPED encoder depth (9/5/5 x 768,
    script/gqa_ood.sh) - 6 steps (12 optimizer updates), BOTH task
    orderings, with t_total small enough that the run CROSSES the
    warmup-linear peak (warmup 0.1 x t_total 16 -> peak at opt step 1.6)
    and samples deep into the decay arm. The 2/1/1 cases above exercise the
    composition cheaply; this one confirms nothing drifts when the full
    19-layer stack and the schedule crossing accumulate."""
    global L_LAYERS, X_LAYERS, R_LAYERS, N_STEPS, BRANCH_PLAN, T_TOTAL
    import dataclasses

    import jax

    from xggm_tpu.checkpoint.torch_bridge import (
        convert_task_model, merge_into)
    from xggm_tpu.config import gqa_ood_config, vqacpv2_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step

    saved = (L_LAYERS, X_LAYERS, R_LAYERS, N_STEPS, list(BRANCH_PLAN),
             T_TOTAL)
    try:
        L_LAYERS, X_LAYERS, R_LAYERS = 9, 5, 5
        N_STEPS = n_steps
        T_TOTAL = 16  # 12 opt steps cross the peak (1.6) into decay (12/16)
        BRANCH_PLAN[:] = (["relation", "representation"] * 3)[:n_steps]
        batches = _make_np_batches(2)

        def build():
            model_t = _build_ref_model()
            from make_goldens import flat_sd
            return (flat_sd(model_t),
                    _torch_trajectory(model_t, batches, ordering))

        sd0, records = cached(
            "fulldepth_traj",
            dict(ordering=ordering, n_steps=n_steps, depth=(9, 5, 5),
                 t_total=T_TOTAL, lr=LR, sigma=SIGMA,
                 plan=tuple(BRANCH_PLAN), bs=BS, num_ans=NUM_ANS),
            build, depends_on=_DEPS)

        cfg = gqa_ood_config() if ordering == "ggm_first" else \
            vqacpv2_config()
        cfg = cfg.replace(
            num_answers=NUM_ANS,
            ggm=dataclasses.replace(cfg.ggm, dropout=0.0, sigma=SIGMA),
            lxmert=cfg.lxmert.replace(
                bert=dataclasses.replace(
                    cfg.lxmert.bert, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)))
        assert (cfg.lxmert.visual.l_layers, cfg.lxmert.visual.x_layers,
                cfg.lxmert.visual.r_layers) == (9, 5, 5)
        assert cfg.train.clean_phase_first == (ordering == "clean_first")

        model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
        b0 = {k: v.astype(np.int32) if v.dtype == np.int64 else v
              for k, v in batches[0].items()}
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            b0["input_ids"], b0["input_mask"], b0["segment_ids"],
            b0["feats"], b0["boxes"], b0["adj"], jax.random.PRNGKey(2),
            method=XGGMModel.init_all)
        flat = convert_task_model(sd0, cfg.lxmert, gnn="GCN", n_layers=2)
        params, unmatched = merge_into(params, flat)
        assert not unmatched, unmatched[:5]

        scales = lr_scale_tree(params,
                               lambda p: not p.startswith("params/lxrt"),
                               1.0, 0.25)
        tx = bert_adam(lr=4 * LR, warmup=0.1, t_total=T_TOTAL,
                       lr_scale=scales)
        state = TrainState(params, tx.init(params))
        steps = {br: make_ggm_train_step(model, tx, cfg.train, br)
                 for br in ("relation", "representation")}
        for i, rec in enumerate(records):
            b = {k: v.astype(np.int32) if v.dtype == np.int64 else v
                 for k, v in batches[i % len(batches)].items()}
            b["noise_override"] = rec["noise"]
            state, m = steps[BRANCH_PLAN[i]](state, b, jax.random.PRNGKey(i))
            np.testing.assert_allclose(
                float(m["ggm_loss"]), rec["ggm_loss"], rtol=5e-3,
                err_msg=f"full-depth step {i} ggm loss, {ordering}")
            np.testing.assert_allclose(
                float(m["clean_loss"]), rec["clean_loss"], rtol=5e-3,
                err_msg=f"full-depth step {i} clean loss, {ordering}")
        assert int(jax.device_get(state.opt_state.count)) == 2 * N_STEPS
    finally:
        L_LAYERS, X_LAYERS, R_LAYERS, N_STEPS, plan, T_TOTAL = saved
        BRANCH_PLAN[:] = plan


@pytest.mark.parametrize("ordering", ["ggm_first", "clean_first"])
def test_two_phase_trajectory_parity(ref_setup, ordering):
    import copy
    import dataclasses

    import jax

    from xggm_tpu.checkpoint.torch_bridge import (
        convert_task_model, merge_into)
    from xggm_tpu.config import gqa_ood_config, vqacpv2_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step

    sd0 = ref_setup.sd0
    batches = _make_np_batches(2)
    records = cached(
        "twophase_traj",
        dict(ordering=ordering, n_steps=N_STEPS,
             depth=(L_LAYERS, X_LAYERS, R_LAYERS), t_total=T_TOTAL, lr=LR,
             sigma=SIGMA, plan=tuple(BRANCH_PLAN), bs=BS, num_ans=NUM_ANS),
        # each ordering gets fresh weights (deepcopy of the pristine model)
        lambda: _torch_trajectory(copy.deepcopy(ref_setup.fresh_model()),
                                  batches, ordering),
        depends_on=_DEPS)

    cfg = gqa_ood_config() if ordering == "ggm_first" else vqacpv2_config()
    cfg = cfg.replace(
        num_answers=NUM_ANS,
        ggm=dataclasses.replace(cfg.ggm, dropout=0.0, sigma=SIGMA),
        lxmert=cfg.lxmert.replace(
            bert=dataclasses.replace(
                cfg.lxmert.bert, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0),
            visual=dataclasses.replace(
                cfg.lxmert.visual, l_layers=L_LAYERS, x_layers=X_LAYERS,
                r_layers=R_LAYERS)))
    assert cfg.train.clean_phase_first == (ordering == "clean_first")

    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    b0 = {k: v.astype(np.int32) if v.dtype == np.int64 else v
          for k, v in batches[0].items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b0["input_ids"], b0["input_mask"], b0["segment_ids"],
        b0["feats"], b0["boxes"], b0["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)

    flat = convert_task_model(sd0, cfg.lxmert, gnn="GCN", n_layers=2)
    params, unmatched = merge_into(params, flat)
    assert not unmatched, unmatched[:5]

    scales = lr_scale_tree(params, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    tx = bert_adam(lr=4 * LR, warmup=0.1, t_total=T_TOTAL, lr_scale=scales)
    state = TrainState(params, tx.init(params))
    steps = {br: make_ggm_train_step(model, tx, cfg.train, br)
             for br in ("relation", "representation")}

    for i, rec in enumerate(records):
        b = {k: v.astype(np.int32) if v.dtype == np.int64 else v
             for k, v in batches[i % len(batches)].items()}
        b["noise_override"] = rec["noise"]
        state, m = steps[BRANCH_PLAN[i]](state, b, jax.random.PRNGKey(i))
        np.testing.assert_allclose(
            float(m["ggm_loss"]), rec["ggm_loss"], rtol=2e-3,
            err_msg=f"step {i} ({BRANCH_PLAN[i]}) ggm loss, {ordering}")
        np.testing.assert_allclose(
            float(m["clean_loss"]), rec["clean_loss"], rtol=2e-3,
            err_msg=f"step {i} clean loss, {ordering}")
        np.testing.assert_allclose(
            float(m["d_loss"]), rec["d_loss"], rtol=5e-3,
            err_msg=f"step {i} d_loss, {ordering}")
    assert int(jax.device_get(state.opt_state.count)) == 2 * N_STEPS


def test_dropout_on_loss_envelope(ref_setup):
    """Dropout-ON statistical guard: bit-parity is impossible across RNG
    stacks, so pin the stochastic training path distributionally instead.
    Reference loop (dropout 0.1 / generator 0.5, model.train()) runs 8
    seeds x 3 clean-first steps; our step (same dropout rates, functional
    PRNG) runs 4 seeds. Each per-step mean clean/ggm loss must land inside
    the reference envelope (mean +- 4 combined standard errors, plus a
    floor) - catches wrong rates, non-inverted scaling, or dropout applied
    in the wrong places, while staying robust to seed noise."""
    import copy
    import dataclasses

    import jax
    import torch

    from xggm_tpu.checkpoint.torch_bridge import (
        convert_task_model, merge_into)
    from xggm_tpu.config import vqacpv2_config
    from xggm_tpu.models.task_model import XGGMModel
    from xggm_tpu.training.bert_adam import bert_adam, lr_scale_tree
    from xggm_tpu.training.steps import TrainState, make_ggm_train_step

    sd0 = ref_setup.sd0
    batches = _make_np_batches(2)
    n_steps, plan = 3, ["representation"] * 3  # VQA delta=0: rep-only

    def build_ref_runs():
        runs = []
        for seed in range(8):
            model_t = copy.deepcopy(ref_setup.fresh_model())
            model_t.train()  # dropout ON
            torch.manual_seed(seed)
            global N_STEPS, BRANCH_PLAN
            saved = (N_STEPS, list(BRANCH_PLAN))
            try:
                N_STEPS = n_steps
                BRANCH_PLAN[:] = plan
                records = _torch_trajectory(model_t, batches, "clean_first")
            finally:
                N_STEPS, BRANCH_PLAN = saved[0], saved[1]
                BRANCH_PLAN[:] = saved[1]
            runs.append([(r["clean_loss"], r["ggm_loss"])
                         for r in records])
        return np.asarray(runs)

    ref_runs = cached(                         # [8, 3, 2]
        "dropout_envelope",
        dict(seeds=8, n_steps=n_steps, plan=tuple(plan),
             depth=(L_LAYERS, X_LAYERS, R_LAYERS), t_total=T_TOTAL, lr=LR,
             sigma=SIGMA, bs=BS, num_ans=NUM_ANS),
        build_ref_runs, depends_on=_DEPS)
    ref_mean, ref_std = ref_runs.mean(0), ref_runs.std(0)

    cfg = vqacpv2_config()
    cfg = cfg.replace(
        num_answers=NUM_ANS,
        ggm=dataclasses.replace(cfg.ggm, sigma=SIGMA),  # dropout 0.5 default
        lxmert=cfg.lxmert.replace(visual=dataclasses.replace(
            cfg.lxmert.visual, l_layers=L_LAYERS, x_layers=X_LAYERS,
            r_layers=R_LAYERS)))
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    b0 = {k: v.astype(np.int32) if v.dtype == np.int64 else v
          for k, v in batches[0].items()}
    params0 = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b0["input_ids"], b0["input_mask"], b0["segment_ids"],
        b0["feats"], b0["boxes"], b0["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    flat = convert_task_model(sd0, cfg.lxmert, gnn="GCN", n_layers=2)
    params0, unmatched = merge_into(params0, flat)
    assert not unmatched, unmatched[:5]
    params_host = jax.tree.map(np.asarray, params0)

    scales = lr_scale_tree(params0, lambda p: not p.startswith("params/lxrt"),
                           1.0, 0.25)
    tx = bert_adam(lr=4 * LR, warmup=0.1, t_total=T_TOTAL, lr_scale=scales)
    step = make_ggm_train_step(model, tx, cfg.train, "representation")

    our_runs = []
    for seed in range(4):
        params = jax.tree.map(jax.numpy.asarray, params_host)
        state = TrainState(params, tx.init(params))
        key = jax.random.PRNGKey(100 + seed)
        run = []
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            b = {k: v.astype(np.int32) if v.dtype == np.int64 else v
                 for k, v in batches[i % len(batches)].items()}
            state, m = step(state, b, sub)
            run.append((float(m["clean_loss"]), float(m["ggm_loss"])))
        our_runs.append(run)
    our_mean = np.asarray(our_runs).mean(0)   # [3, 2]

    # envelope: |mean_ours - mean_ref| <= 4 * combined SE + small floor
    se = ref_std * np.sqrt(1 / 8 + 1 / 4)
    tol = 4.0 * se + 0.02 * np.abs(ref_mean)
    assert np.all(np.abs(our_mean - ref_mean) <= tol), (
        f"dropout-ON loss envelope violated:\nours {our_mean}\n"
        f"ref {ref_mean} +- {tol}")
