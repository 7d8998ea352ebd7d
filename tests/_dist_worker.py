"""Worker process for tests/test_distributed.py::test_two_process_cpu.

Launched twice (process 0 and 1); each process exposes 4 virtual CPU
devices, joins the JAX distributed runtime over a localhost coordinator,
and drives the multi-host primitives end-to-end: hybrid mesh over 8 global
devices, per-process local-shard batch assembly, a jitted global reduction
(the cross-process collective), cross-process fetch, and the Feeder's
multi-process path. Prints WORKER_OK on success.
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    # env vars alone are ignored (sitecustomize pre-imports jax)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from xggm_tpu.parallel.distributed import (
        init_distributed, local_batch_to_global, make_hybrid_mesh,
        process_slice, to_host)

    ppid, pcount = init_distributed(coordinator, nproc, pid)
    assert (ppid, pcount) == (pid, nproc), (ppid, pcount)
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    mesh = make_hybrid_mesh()
    assert dict(mesh.shape) == {"data": 8, "model": 1}, dict(mesh.shape)
    # DCN-outermost: the first half of the data axis must be process 0's
    # devices, the second half process 1's
    col = mesh.devices[:, 0]
    assert [d.process_index for d in col] == [0] * 4 + [1] * 4

    # --- global batch from per-process rows + a global collective ---
    full = np.arange(16, dtype=np.float32).reshape(8, 2)
    rows = process_slice(np.arange(8), ppid, pcount)
    g = local_batch_to_global(mesh, {"x": full[rows]}, 8)
    assert g["x"].shape == (8, 2)

    import jax.numpy as jnp
    total = jax.jit(lambda t: jnp.sum(t["x"]))(g)  # all-reduce across hosts
    assert float(jax.device_get(total)) == float(full.sum())
    np.testing.assert_array_equal(to_host(g["x"]), full)  # cross-host fetch

    # --- Feeder multi-process path: ragged last batch, global qids ---
    feats = np.arange(30, dtype=np.float32).reshape(10, 3)

    class FakeDS:
        def __len__(self):
            return 10

        def question_ids(self, idx):
            return [f"q{i}" for i in np.asarray(idx)]

        def get_batch(self, idx):
            return {"feats": feats[np.asarray(idx)]}

    from xggm_tpu.data.feeder import Feeder
    # global batch 8 (must divide the 8-way data axis, as single-host);
    # 10 rows -> the last batch is ragged (2 valid rows, 6 padded)
    feeder = Feeder(FakeDS(), 8, shuffle=False, drop_last=False, mesh=mesh,
                    process_index=ppid, process_count=pcount)
    batches = list(feeder)
    assert len(batches) == 2, len(batches)
    qids0, b0, m0 = batches[0]
    assert qids0 == [f"q{i}" for i in range(8)] and m0.all()
    np.testing.assert_array_equal(to_host(b0["feats"]), feats[:8])
    qids1, b1, m1 = batches[1]
    assert qids1 == ["q8", "q9"]
    assert m1.tolist() == [True] * 2 + [False] * 6
    np.testing.assert_array_equal(to_host(b1["feats"])[:2], feats[8:10])

    # --- multi-host ZeRO: cross-process-sharded optimizer state is
    # steppable, checkpointable (collective allgather snapshot), and
    # restorable back onto the sharded layout ---
    zero_dir = os.environ.get("XGGM_DW_ZERO_DIR")
    if zero_dir:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from xggm_tpu.checkpoint.manager import CheckpointManager
        from xggm_tpu.parallel.mesh import (
            axis_sharded_leaves, maybe_zero_shard_state)
        from xggm_tpu.training.bert_adam import bert_adam
        from xggm_tpu.training.steps import (
            TrainState, _clip_update_apply, _constrain_state)

        params = {"w": jnp.full((16, 8), 0.5, jnp.float32),
                  "b": jnp.zeros((8,), jnp.float32)}
        psh = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
        params = jax.tree.map(jax.device_put, params, psh)
        tx = bert_adam(lr=1e-2, warmup=0.1, t_total=100)
        state = TrainState(params, tx.init(params))
        state, ssh = maybe_zero_shard_state(state, mesh, psh, True)
        m_w = state.opt_state.m["w"]
        assert not m_w.is_fully_addressable  # spans both processes
        assert len(axis_sharded_leaves(state.opt_state.m, "data")) == 2

        @jax.jit
        def step(state, grads):
            state = _clip_update_apply(tx, grads, state, 5.0)
            return _constrain_state(state, ssh)

        grads = jax.tree.map(jnp.ones_like, params)
        state = step(state, grads)
        state = step(state, grads)
        w_after = to_host(state.params["w"])

        ckpt = CheckpointManager(zero_dir)
        ckpt.save("ZERO", {"params": state.params,
                           "opt_state": state.opt_state}, block=True)
        restored = ckpt.load("ZERO", like={"params": state.params,
                                           "opt_state": state.opt_state})
        np.testing.assert_array_equal(restored["params"]["w"], w_after)
        # re-place the restored host arrays back onto the ZeRO layout
        state2 = TrainState(
            jax.tree.map(jax.device_put, restored["params"], psh),
            restored["opt_state"])
        state2, _ = maybe_zero_shard_state(state2, mesh, psh, True)
        assert not state2.opt_state.m["w"].is_fully_addressable
        state2 = step(state2, grads)
        np.testing.assert_array_equal(
            to_host(state2.opt_state.count), 3)
        print("ZERO_OK", ppid, flush=True)

    print("WORKER_OK", ppid, flush=True)


if __name__ == "__main__":
    main()
