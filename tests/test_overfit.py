"""Learning-dynamics integration test: the full two-phase GGM step must be
able to overfit one small batch (validates loss wiring, gradient signs, lr
schedule, and the two-optimizer-step structure end-to-end)."""
import jax
import numpy as np

from xggm_tpu.config import tiny_test_config
from xggm_tpu.models.task_model import XGGMModel
from xggm_tpu.training.bert_adam import bert_adam
from xggm_tpu.training.steps import TrainState, make_ggm_train_step

from test_smoke import make_batch


def test_overfit_single_batch():
    cfg = tiny_test_config()
    model = XGGMModel(cfg.lxmert, cfg.ggm, cfg.num_answers)
    batch = make_batch(cfg, bs=8, seed=3)
    # one-hot targets
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 16, 8)
    batch["target"] = np.eye(16, dtype=np.float32)[labels]

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_ids"], batch["input_mask"], batch["segment_ids"],
        batch["feats"], batch["boxes"], batch["adj"], jax.random.PRNGKey(2),
        method=XGGMModel.init_all)
    n_steps = 30
    tx = bert_adam(lr=5e-4, warmup=0.1, t_total=2 * n_steps)
    state = TrainState(params, tx.init(params))
    step = make_ggm_train_step(model, tx, cfg.train, "representation")

    first_loss = None
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first_loss is None:
            first_loss = float(m["clean_loss"])
    last_loss = float(m["clean_loss"])
    preds = np.asarray(m["preds"])

    assert last_loss < 0.25 * first_loss, (first_loss, last_loss)
    acc = float((preds == labels).mean())
    assert acc >= 0.75, f"failed to overfit: acc={acc}"
