"""Preemption-safe training (utils/preempt.py): SIGTERM -> mid-epoch
PREEMPT checkpoint -> exact resume.

The reference has no preemption/resume story (weights-only saves, SURVEY
§5.3/§5.4); this is TPU-production behavior: pods get maintenance SIGTERMs
with a short grace window.

Pinned here:
  * guard unit semantics (signal flag, chaining, rng state pack/unpack)
  * THE equivalence that makes the feature trustworthy: preempt mid-epoch +
    resume == the uninterrupted run, bitwise on the final parameters (same
    shuffle position, same host/device RNG streams, same optimizer state)
  * the real CLI path: SIGTERM to a live training subprocess -> exit code
    75 (EX_TEMPFAIL) + PREEMPT on disk -> --resume completes the run and
    clears the cursor.
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

import jax

from xggm_tpu.config import tiny_test_config, DataConfig, TrainConfig
from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab
from xggm_tpu.training.trainer import XGGMTrainer
from xggm_tpu.utils.preempt import (
    PREEMPTED_EXIT_CODE, Preempted, PreemptionGuard, pack_rng_state,
    unpack_rng_state)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_guard_flag_and_signal_chaining():
    guard = PreemptionGuard(signals=(signal.SIGUSR1,))
    try:
        assert not guard.should_save(1)
        seen = []
        # a pre-existing handler must keep firing (chained, not clobbered)
        prev = signal.signal(signal.SIGUSR1, lambda s, f: seen.append(s))
        guard2 = PreemptionGuard(signals=(signal.SIGUSR1,))
        try:
            os.kill(os.getpid(), signal.SIGUSR1)
            deadline = time.time() + 5
            while not guard2.signaled and time.time() < deadline:
                time.sleep(0.01)
            assert guard2.signaled and seen == [signal.SIGUSR1]
            assert guard2.should_save(3)
            assert not guard.signaled  # separate guard, separate flag
        finally:
            guard2.uninstall()
            signal.signal(signal.SIGUSR1, prev)
    finally:
        guard.uninstall()


def test_rng_state_roundtrip():
    import random

    rng = random.Random(7)
    [rng.randint(1, 10) for _ in range(13)]
    packed = pack_rng_state(rng)
    expect = [rng.randint(1, 10) for _ in range(20)]
    rng2 = random.Random(0)
    unpack_rng_state(rng2, packed)
    assert [rng2.randint(1, 10) for _ in range(20)] == expect


class _StepGuard(PreemptionGuard):
    """Deterministic 'preemption notice' at a fixed step (no real signal)."""

    def __init__(self, at_step: int):
        super().__init__(install=False)
        self.at_step = at_step

    def should_save(self, step_id: int) -> bool:
        return step_id >= self.at_step


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_data"))
    make_synthetic_gqa(root, "train", n_images=8, n_questions=32, feat_dim=32)
    make_synthetic_gqa(root, "val", n_images=4, n_questions=12, feat_dim=32,
                       seed=1)
    write_vocab(os.path.join(root, "vocab.txt"))
    return root


def _cfg(corpus, out):
    return tiny_test_config(
        output=out,
        data=DataConfig(train="train", valid="val", data_root=corpus),
        train=TrainConfig(batch_size=8, lr=1e-4, epochs=2, seed=1),
    )


def test_preempt_resume_matches_uninterrupted_run(corpus, tmp_path):
    """Preempt at step 3 of epoch 0 (4 batches/epoch), resume, finish both
    epochs: final params must equal the uninterrupted run's bitwise."""
    # --- run A: uninterrupted ---
    ta = XGGMTrainer(_cfg(corpus, str(tmp_path / "a")), task="gqa")
    ta.preempt = PreemptionGuard(install=False)
    ta.train()
    params_a = jax.device_get(ta.state.params)
    count_a = int(np.asarray(ta.state.opt_state.count))
    assert count_a == 16  # 2 epochs x 4 batches x 2 optimizer steps

    # --- run B: preempted mid-epoch 0 ---
    out_b = str(tmp_path / "b")
    tb = XGGMTrainer(_cfg(corpus, out_b), task="gqa")
    tb.preempt = _StepGuard(at_step=3)
    with pytest.raises(Preempted):
        tb.train()
    assert os.path.isdir(os.path.join(out_b, "PREEMPT"))
    assert int(np.asarray(tb.state.opt_state.count)) == 6  # 3 batches x 2

    # --- run C: fresh process-equivalent, --resume semantics ---
    tc = XGGMTrainer(_cfg(corpus, out_b), task="gqa")
    tc.preempt = PreemptionGuard(install=False)
    start = tc.resume()
    assert start == 0  # mid-epoch 0
    assert tc._resume_cursor == {"skip_batches": 3, "train_iter": 3,
                                 "best_valid": tc._resume_cursor["best_valid"]}
    tc.train(start)
    assert int(np.asarray(tc.state.opt_state.count)) == count_a
    # consumed cursor is cleared so a later --resume can't rewind
    assert not os.path.isdir(os.path.join(out_b, "PREEMPT"))

    params_c = jax.device_get(tc.state.params)
    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_c = jax.tree.leaves(params_c)
    assert len(flat_a) == len(flat_c)
    for (path, a), c in zip(flat_a, flat_c):
        np.testing.assert_array_equal(
            a, c, err_msg=f"param mismatch after resume: {path}")


def test_stale_preempt_loses_to_newer_epoch_checkpoint(corpus, tmp_path):
    """A PREEMPT cursor from epoch 0 must NOT rewind a run whose BEST_1
    (completed epoch 1) already exists."""
    out = str(tmp_path / "o")
    t = XGGMTrainer(_cfg(corpus, out), task="gqa")
    t.preempt = _StepGuard(at_step=1)
    with pytest.raises(Preempted):
        t.train()
    # simulate a completed later epoch
    t.save("BEST_1", epoch=1)
    t2 = XGGMTrainer(_cfg(corpus, out), task="gqa")
    assert t2.resume() == 2  # BEST_1 wins; next epoch
    assert t2._resume_cursor is None


@pytest.fixture(scope="module")
def pt_corpus(tmp_path_factory):
    from xggm_tpu.data.pretrain_data import LxmertPretrainDataset
    from xggm_tpu.data.synthetic_pretrain import make_synthetic_pretrain
    from xggm_tpu.data.tokenizer import BertTokenizer

    root = str(tmp_path_factory.mktemp("ptdata"))
    make_synthetic_pretrain(root, n_images=8, sents_per_img=2, feat_dim=32)
    ds = LxmertPretrainDataset("mscoco_train", root)
    ds.load_features_h5(
        os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36.h5"),
        os.path.join(root, "lxmert_imgfeat", "mscoco_train_obj36_info.json"))
    tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
    return ds, tok


def test_pretrainer_preempt_resume_matches_uninterrupted(pt_corpus, tmp_path):
    """Pretraining: preempt after batch 1 of epoch 0 (4 batches/epoch: 8
    images x 2 sents x 2 sources (mscoco + vqa) = 32 flattened examples at
    bs 8; 2 epochs), resume, finish - final params bitwise-equal to the
    straight run. Exercises BOTH host RNG captures: the epoch-shuffle RandomState
    (restored to epoch start, order regenerated, prefix skipped) and the
    featurizer's masking RandomState (restored to the preemption point -
    skipped batches are never re-featurized)."""
    from xggm_tpu.data.pretrain_data import PretrainFeaturizer
    from xggm_tpu.training.pretrainer import LxmertPretrainer

    ds, tok = pt_corpus

    def fresh(seed):
        return PretrainFeaturizer(ds, tok, max_seq_length=20,
                                  task_matched=True, seed=seed)

    def make(out):
        cfg = tiny_test_config(
            output=out,
            train=TrainConfig(batch_size=8, lr=1e-4, epochs=2, seed=0))
        return LxmertPretrainer(cfg, fresh(0), valid_feat=fresh(1))

    # --- run A: uninterrupted ---
    ta = make(str(tmp_path / "a"))
    ta.preempt = PreemptionGuard(install=False)
    ta.train()
    params_a = jax.device_get(ta.state.params)
    assert int(np.asarray(ta.state.opt_state.count)) == 8  # 2 ep x 4 batches

    # --- run B: preempted after the first optimizer step ---
    out_b = str(tmp_path / "b")
    tb = make(out_b)
    tb.preempt = _StepGuard(at_step=1)
    with pytest.raises(Preempted):
        tb.train()
    assert os.path.isdir(os.path.join(out_b, "PREEMPT"))
    assert int(np.asarray(tb.state.opt_state.count)) == 1

    # --- run C: fresh trainer, resume, finish ---
    tc = make(out_b)
    tc.preempt = PreemptionGuard(install=False)
    start = tc.resume()
    assert start == 0 and tc._resume_cursor["skip"] == 1
    tc.train(start)
    assert int(np.asarray(tc.state.opt_state.count)) == 8
    assert not os.path.isdir(os.path.join(out_b, "PREEMPT"))

    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_c = jax.tree.leaves(jax.device_get(tc.state.params))
    assert len(flat_a) == len(flat_c)
    for (path, a), c in zip(flat_a, flat_c):
        np.testing.assert_array_equal(
            a, c, err_msg=f"pretrain param mismatch after resume: {path}")


def test_cli_sigterm_preempts_and_resumes(tmp_path):
    """Real signal through the real entry point: SIGTERM a live training
    subprocess -> rc 75 + PREEMPT; rerun --resume -> completes."""
    data_root = str(tmp_path / "data")
    output = str(tmp_path / "snap")
    argv = [sys.executable, "-m", "xggm_tpu.cli.gqa_ood",
            "--synthetic", "--device", "cpu",
            "--data_root", data_root, "--output", output,
            "--train", "train", "--valid", "val",
            "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
            "--gnn", "GCN", "--num_layer", "1",
            "--bs", "8", "--epochs", "8", "--lr", "1e-4"]
    env = {**os.environ, "JAX_COMPILATION_CACHE_DIR":
           os.path.join(REPO, "tests", ".jax_cache")}
    metrics = os.path.join(output, "metrics.jsonl")
    proc = subprocess.Popen(argv, cwd=REPO, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    try:
        # wait for training steps to be underway (post-compile), then evict
        deadline = time.time() + 1200
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail("training finished before SIGTERM landed:\n"
                            + proc.communicate()[0][-2000:])
            if os.path.exists(metrics) and os.path.getsize(metrics) > 0:
                break
            time.sleep(0.2)
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == PREEMPTED_EXIT_CODE, (
        f"rc={proc.returncode}\nstdout:\n{out[-2000:]}\nstderr:\n{err[-2000:]}")
    assert "PREEMPT checkpoint committed" in out
    assert os.path.isdir(os.path.join(output, "PREEMPT"))

    # the preempted run stopped mid-schedule (step records carry "branch")
    n_steps_before = sum(1 for line in open(metrics)
                         if "branch" in json.loads(line))

    proc2 = subprocess.run(argv + ["--resume"], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=1500)
    assert proc2.returncode == 0, (
        f"resume failed rc={proc2.returncode}\n"
        f"stdout:\n{proc2.stdout[-2000:]}\nstderr:\n{proc2.stderr[-2000:]}")
    assert "resumed from PREEMPT" in proc2.stdout
    assert "Best valid:" in proc2.stdout
    assert not os.path.isdir(os.path.join(output, "PREEMPT"))
    # the two runs together cover every training step EXACTLY once: step ids
    # in metrics.jsonl are contiguous from 0 with no duplicates (a replayed
    # batch would duplicate, a skipped one would gap), and the total is a
    # whole number of epochs (8 epochs x batches/epoch)
    steps = [json.loads(line)["step"] for line in open(metrics)
             if "branch" in json.loads(line)]
    assert sorted(steps) == list(range(len(steps)))
    assert len(steps) % 8 == 0 and len(steps) >= 8
    assert n_steps_before < len(steps)
