"""End-to-end trainer: synthetic GQA corpus -> train 1 epoch -> predict ->
evaluate -> checkpoint save/resume."""
import os

import numpy as np
import pytest

from xggm_tpu.config import tiny_test_config, DataConfig, TrainConfig
from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab
from xggm_tpu.training.trainer import XGGMTrainer


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_data"))
    make_synthetic_gqa(root, "train", n_images=8, n_questions=32, feat_dim=32)
    make_synthetic_gqa(root, "val", n_images=4, n_questions=12, feat_dim=32,
                       seed=1)
    write_vocab(os.path.join(root, "vocab.txt"))
    out = str(tmp_path_factory.mktemp("out"))
    cfg = tiny_test_config(
        output=out,
        data=DataConfig(train="train", valid="val", data_root=root),
        train=TrainConfig(batch_size=8, lr=1e-4, epochs=1, seed=1),
    )
    return cfg


def test_trainer_end_to_end(env):
    trainer = XGGMTrainer(env, task="gqa")
    assert trainer.num_answers == 16
    assert trainer.oracle_score() == pytest.approx(1.0)

    best = trainer.train()
    assert 0.0 <= best <= 1.0
    # two optimizer steps per batch: 4 batches/epoch -> count == 8
    assert int(np.asarray(trainer.state.opt_state.count)) == 8
    assert os.path.exists(os.path.join(env.output, "log.log"))
    assert os.path.exists(os.path.join(env.output, "metrics.jsonl"))

    # predict + dump
    quesid2ans = trainer.predict(trainer.valid_set,
                                 dump_path=os.path.join(env.output, "p.json"))
    assert len(quesid2ans) == 12
    assert os.path.exists(os.path.join(env.output, "p.json"))


def test_trainer_on_mesh(env, tmp_path):
    """Same trainer, batch sharded over the virtual 8-device mesh."""
    import dataclasses
    import jax

    from xggm_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    cfg = env.replace(output=str(tmp_path / "mesh_out"))
    mesh = make_mesh()
    trainer = XGGMTrainer(cfg, task="gqa", mesh=mesh)
    best = trainer.train()
    assert 0.0 <= best <= 1.0
    assert int(np.asarray(trainer.state.opt_state.count)) == 8
    preds = trainer.predict(trainer.valid_set)
    assert len(preds) == 12


def test_train_baseline(env, tmp_path):
    """Plain-BCE baseline loop (reference vqacpv2_baseline.py): one clean
    step per batch, runs to completion and logs."""
    cfg = env.replace(output=str(tmp_path / "base_out"))
    trainer = XGGMTrainer(cfg, task="gqa")
    best = trainer.train_baseline()
    assert 0.0 <= best <= 1.0
    # ONE optimizer step per batch here: 4 batches/epoch -> count == 4
    assert int(np.asarray(trainer.state.opt_state.count)) == 4
    assert os.path.exists(os.path.join(cfg.output, "log.log"))


def test_profile_trace_closes_on_short_run(env, tmp_path):
    """profile_steps > total steps: the trace must still be closed at the
    end of train() (regression: stop_trace only fired on exact equality)."""
    cfg = env.replace(output=str(tmp_path / "prof_out"))
    trainer = XGGMTrainer(cfg, task="gqa", profile_steps=10_000)
    trainer.train()
    # a leaked trace would make the next start_trace raise
    import jax

    jax.profiler.start_trace(str(tmp_path / "t2"))
    jax.profiler.stop_trace()


def test_mesh_keeps_pallas_attention(env, tmp_path):
    """The fused attention kernels carry custom_partitioning rules, so a
    multi-device mesh keeps the pallas path (no silent XLA fallback) and the
    full two-phase step runs on it - matching the reference carrying its
    whole model under DataParallel (src/lxrt/entry.py:103-104)."""
    import dataclasses

    from xggm_tpu.parallel.mesh import make_mesh

    cfg = env.replace(output=str(tmp_path / "pal_out"))
    cfg = cfg.replace(lxmert=cfg.lxmert.replace(
        bert=dataclasses.replace(cfg.lxmert.bert,
                                 use_pallas_attention=True)))
    trainer = XGGMTrainer(cfg, task="gqa", mesh=make_mesh())
    assert trainer.cfg.lxmert.bert.use_pallas_attention
    best = trainer.train()
    assert 0.0 <= best <= 1.0
    # two optimizer steps per batch across the epoch, same as single-chip
    assert int(np.asarray(trainer.state.opt_state.count)) == 8


def test_training_is_deterministic(env, tmp_path):
    """Same seed -> bit-identical metrics trajectory and final params. The
    functional-RNG design makes runs exactly reproducible (the reference's
    global torch RNG cannot guarantee this across loader configs)."""
    import json

    import jax

    def run(out):
        cfg = env.replace(output=str(tmp_path / out))
        trainer = XGGMTrainer(cfg, task="gqa")
        trainer.train()
        with open(os.path.join(cfg.output, "metrics.jsonl")) as f:
            metrics = [json.loads(line) for line in f]
        return trainer, metrics

    t1, m1 = run("det1")
    t2, m2 = run("det2")
    assert len(m1) == len(m2) > 0
    for a, b in zip(m1, m2):
        for k in a:
            if k == "ts":
                continue
            assert a[k] == b[k], (k, a, b)
    for pa, pb in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_checkpoint_roundtrip(env):
    trainer = XGGMTrainer(env, task="gqa")
    trainer.save("CKPT_TEST")
    p0 = trainer.predict(trainer.valid_set)

    trainer2 = XGGMTrainer(env, task="gqa")
    trainer2.load("CKPT_TEST")
    p1 = trainer2.predict(trainer2.valid_set)
    assert p0 == p1


def test_checkpoint_async_saves(env):
    """Saves commit in the background (mid-epoch BEST saves overlap the next
    train steps); back-to-back saves serialize, load barriers on the
    in-flight commit, and the snapshot is taken at call time - mutating the
    live state after save() must not leak into the checkpoint."""
    import jax

    trainer = XGGMTrainer(env, task="gqa")
    ck = trainer.ckpt
    state0 = {"params": trainer.state.params, "x": np.arange(4.0)}
    ck.save("ASYNC_A", state0)            # returns before the disk commit
    ck.save("ASYNC_B", {"x": np.full(4, 7.0)})  # barriers on A, starts B
    # mutate the host array AFTER save returned: commit must hold the snapshot
    state0["x"][:] = -1.0
    restored = ck.load("ASYNC_A", like={"params": trainer.state.params,
                                        "x": np.zeros(4)})
    np.testing.assert_array_equal(restored["x"], np.arange(4.0))
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(trainer.state.params), restored["params"])
    np.testing.assert_array_equal(
        ck.load("ASYNC_B", like={"x": np.zeros(4)})["x"], np.full(4, 7.0))
    ck.wait()  # idempotent with nothing in flight


def test_checkpoint_snapshot_survives_donation(env):
    """device_get on a CPU-backed jax.Array is a zero-copy VIEW of the
    device buffer; if the manager kept that view, a donated train step
    reusing the buffer would corrupt an in-flight background commit. The
    manager must own its snapshot (checkpoint/manager.py _host_copy)."""
    import jax
    import jax.numpy as jnp

    trainer = XGGMTrainer(env, task="gqa")
    big = jnp.arange(65536, dtype=jnp.float32)
    expect = np.asarray(big).copy()
    trainer.ckpt.save("DONATED", {"big": big})  # async commit starts
    overwrite = jax.jit(lambda a: a * 0.0 - 5.0, donate_argnums=0)
    big = overwrite(big)  # donation reuses the buffer the view aliased
    float(big.sum())
    restored = trainer.ckpt.load(
        "DONATED", like={"big": np.zeros(65536, np.float32)})
    np.testing.assert_array_equal(restored["big"], expect)
