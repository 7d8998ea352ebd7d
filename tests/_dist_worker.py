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

    print("WORKER_OK", ppid, flush=True)


if __name__ == "__main__":
    main()
