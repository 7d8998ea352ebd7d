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


def test_checkpoint_roundtrip(env):
    trainer = XGGMTrainer(env, task="gqa")
    trainer.save("CKPT_TEST")
    p0 = trainer.predict(trainer.valid_set)

    trainer2 = XGGMTrainer(env, task="gqa")
    trainer2.load("CKPT_TEST")
    p1 = trainer2.predict(trainer2.valid_set)
    assert p0 == p1
