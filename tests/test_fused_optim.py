"""Fused Pallas BertAdam == reference-path BertAdam, bit-for-bit trajectory.

The fused kernel (ops/pallas_optim.py) must reproduce the exact sequence of
clip_by_global_norm -> bert_adam.update -> apply_updates, including the lazy
per-leaf activation and per-leaf schedule counters. Runs interpreted on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from xggm_tpu.training.bert_adam import bert_adam
from xggm_tpu.training.steps import TrainState, _clip_update_apply


def _tree(rng, scale=1.0):
    # odd shapes on purpose: exercises non-128-multiple blocking and 1D/0D
    return {
        "enc": {"w": jnp.asarray(rng.randn(37, 630) * scale, jnp.float32),
                "b": jnp.asarray(rng.randn(630) * scale, jnp.float32)},
        "head": {"w": jnp.asarray(rng.randn(64, 1842) * scale, jnp.float32),
                 "ln": jnp.asarray(rng.randn(7) * scale, jnp.float32)},
        "late": {"w": jnp.asarray(rng.randn(9, 257) * scale, jnp.float32)},
    }


def test_fused_matches_reference_path():
    rng = np.random.RandomState(0)
    params = _tree(rng)
    lr_scale = {"enc": {"w": 0.25, "b": 0.25},
                "head": {"w": 1.0, "ln": 1.0}, "late": {"w": 1.0}}
    kw = dict(lr=1e-2, warmup=0.1, t_total=12, weight_decay=0.01,
              lr_scale=lr_scale)
    ref_tx = bert_adam(**kw)
    fused_tx = bert_adam(fused=True, **kw)

    ref_state = TrainState(params, ref_tx.init(params))
    fus_state = TrainState(params, fused_tx.init(params))

    for step in range(6):
        grads = _tree(rng, scale=10.0 if step == 2 else 0.5)  # step 2 clips
        # 'late' leaf joins at step 3 (lazy activation; zero grads before)
        if step < 3:
            grads["late"]["w"] = jnp.zeros_like(grads["late"]["w"])
        ref_state = _clip_update_apply(ref_tx, grads, ref_state, 5.0)
        fus_state = _clip_update_apply(fused_tx, grads, fus_state, 5.0)

        for (pr, pf) in zip(jax.tree.leaves(ref_state.params),
                            jax.tree.leaves(fus_state.params)):
            np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"step {step}")
        for (mr, mf) in zip(jax.tree.leaves(ref_state.opt_state.m),
                            jax.tree.leaves(fus_state.opt_state.m)):
            np.testing.assert_allclose(np.asarray(mf), np.asarray(mr),
                                       rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(fus_state.opt_state.leaf_count)),
            np.asarray(jax.tree.leaves(ref_state.opt_state.leaf_count)))

    # late leaf: inactive for 3 steps -> count 3, not 6
    assert int(fus_state.opt_state.leaf_count["late"]["w"]) == 3
    assert int(fus_state.opt_state.leaf_count["enc"]["w"]) == 6
    # inactive period left params untouched
    # (they only started moving at step 3; verified implicitly vs ref path)


def test_flat_matches_reference_path():
    """Flat single-buffer BertAdam == tree BertAdam, bit-for-bit trajectory
    (incl. lazy activation, per-leaf counters, clipping, lr_scale)."""
    rng = np.random.RandomState(0)
    params = _tree(rng)
    lr_scale = {"enc": {"w": 0.25, "b": 0.25},
                "head": {"w": 1.0, "ln": 1.0}, "late": {"w": 1.0}}
    kw = dict(lr=1e-2, warmup=0.1, t_total=12, weight_decay=0.01,
              lr_scale=lr_scale)
    ref_tx = bert_adam(**kw)
    flat_tx = bert_adam(flat=True, **kw)

    ref_state = TrainState(params, ref_tx.init(params))
    fl_state = TrainState(params, flat_tx.init(params))

    for step in range(6):
        grads = _tree(rng, scale=10.0 if step == 2 else 0.5)  # step 2 clips
        if step < 3:  # 'late' leaf joins at step 3 (lazy activation)
            grads["late"]["w"] = jnp.zeros_like(grads["late"]["w"])
        ref_state = _clip_update_apply(ref_tx, grads, ref_state, 5.0)
        fl_state = _clip_update_apply(flat_tx, grads, fl_state, 5.0)

        for (pr, pf) in zip(jax.tree.leaves(ref_state.params),
                            jax.tree.leaves(fl_state.params)):
            np.testing.assert_array_equal(np.asarray(pf), np.asarray(pr),
                                          err_msg=f"step {step}")
        np.testing.assert_array_equal(
            np.asarray(fl_state.opt_state.leaf_count),
            np.asarray(jax.tree.leaves(ref_state.opt_state.leaf_count)))

    # late leaf: inactive for 3 steps -> count 3, not 6
    lc = dict(zip([  # leaf order = tree_flatten order
        "enc/b", "enc/w", "head/ln", "head/w", "late/w"],
        np.asarray(fl_state.opt_state.leaf_count)))
    assert lc["late/w"] == 3 and lc["enc/w"] == 6


def test_flat_jits_and_donates():
    """The flat step works under jit with donated state (the trainer's
    usage) and keeps exact equality with the tree path."""
    import functools

    rng = np.random.RandomState(3)
    params = _tree(rng)
    kw = dict(lr=1e-2, warmup=0.1, t_total=20, weight_decay=0.01)
    ref_tx = bert_adam(**kw)
    flat_tx = bert_adam(flat=True, **kw)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step_flat(grads, state):
        return _clip_update_apply(flat_tx, grads, state, 5.0)

    ref_state = TrainState(params, ref_tx.init(params))
    fl_state = TrainState(params, flat_tx.init(params))
    for i in range(3):
        grads = _tree(rng, scale=0.5)
        ref_state = _clip_update_apply(ref_tx, grads, ref_state, 5.0)
        fl_state = step_flat(grads, fl_state)
    for (pr, pf) in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(fl_state.params)):
        # jit fusion may FMA/reorder: 1-ulp tolerance (the eager test above
        # is the bit-exact one)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                                   rtol=1e-6, atol=1e-7)


def test_jnp_fused_matches_reference_path():
    """Single-traversal jnp clip+update+apply == the three-stage tree path
    (lazy activation, per-leaf counters, clipping, lr_scale)."""
    rng = np.random.RandomState(0)
    params = _tree(rng)
    lr_scale = {"enc": {"w": 0.25, "b": 0.25},
                "head": {"w": 1.0, "ln": 1.0}, "late": {"w": 1.0}}
    kw = dict(lr=1e-2, warmup=0.1, t_total=12, weight_decay=0.01,
              lr_scale=lr_scale)
    ref_tx = bert_adam(**kw)
    jf_tx = bert_adam(jnp_fused=True, **kw)

    ref_state = TrainState(params, ref_tx.init(params))
    jf_state = TrainState(params, jf_tx.init(params))
    for step in range(6):
        grads = _tree(rng, scale=10.0 if step == 2 else 0.5)
        if step < 3:
            grads["late"]["w"] = jnp.zeros_like(grads["late"]["w"])
        ref_state = _clip_update_apply(ref_tx, grads, ref_state, 5.0)
        jf_state = _clip_update_apply(jf_tx, grads, jf_state, 5.0)
        for (pr, pf) in zip(jax.tree.leaves(ref_state.params),
                            jax.tree.leaves(jf_state.params)):
            np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"step {step}")
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(jf_state.opt_state.leaf_count)),
            np.asarray(jax.tree.leaves(ref_state.opt_state.leaf_count)))
    assert int(jf_state.opt_state.leaf_count["late"]["w"]) == 3
    assert int(jf_state.opt_state.leaf_count["enc"]["w"]) == 6


def test_lazy_activation_skips_weight_decay():
    """A never-used leaf must not decay (reference: p.grad is None -> skip)."""
    rng = np.random.RandomState(1)
    params = {"used": jnp.asarray(rng.randn(8, 8), jnp.float32),
              "unused": jnp.asarray(rng.randn(8, 8), jnp.float32)}
    tx = bert_adam(lr=1e-2, warmup=0.1, t_total=10, weight_decay=0.5)
    state = TrainState(params, tx.init(params))
    for i in range(4):
        grads = {"used": jnp.asarray(rng.randn(8, 8), jnp.float32),
                 "unused": jnp.zeros((8, 8), jnp.float32)}
        state = _clip_update_apply(tx, grads, state, 5.0)
    np.testing.assert_array_equal(np.asarray(state.params["unused"]),
                                  np.asarray(params["unused"]))
    assert int(state.opt_state.leaf_count["unused"]) == 0
    assert int(state.opt_state.leaf_count["used"]) == 4
    assert not np.allclose(np.asarray(state.params["used"]),
                           np.asarray(params["used"]))
