"""Multi-host SPMD layer (xggm_tpu/parallel/distributed.py).

The reference tops out at single-process nn.DataParallel (reference
src/lxrt/entry.py:103-104); SURVEY §5.8 specifies the TPU-native multi-host
design this layer implements. Single-process semantics are pinned on the
8-device virtual CPU mesh; true cross-process behavior (jax.distributed
runtime, gloo CPU collectives, non-addressable global arrays) is pinned by
launching two real worker processes over a localhost coordinator.
"""
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from xggm_tpu.parallel.distributed import (
    init_distributed, local_batch_to_global, make_hybrid_mesh,
    process_slice, to_host)
from xggm_tpu.parallel.mesh import make_mesh, shard_batch

HERE = os.path.dirname(os.path.abspath(__file__))


def test_init_distributed_single_process_noop():
    assert init_distributed() == (0, 1)
    assert init_distributed(num_processes=1) == (0, 1)


def test_hybrid_mesh_single_process_falls_back():
    mesh = make_hybrid_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    ref = make_mesh(model_parallel=2)
    assert (mesh.devices == ref.devices).all()


def test_local_batch_to_global_matches_shard_batch():
    mesh = make_mesh(model_parallel=1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
             "y": np.arange(16, dtype=np.int32)}
    g = local_batch_to_global(mesh, batch, 16)
    ref = shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(ref[k]))
        assert g[k].sharding == ref[k].sharding


def test_process_slice():
    idx = np.arange(12)
    np.testing.assert_array_equal(process_slice(idx, 0, 4), idx[:3])
    np.testing.assert_array_equal(process_slice(idx, 3, 4), idx[9:])
    with pytest.raises(ValueError, match="not divisible"):
        process_slice(np.arange(10), 0, 4)


def test_to_host_addressable():
    mesh = make_mesh()
    x = shard_batch(mesh, {"x": np.arange(8, dtype=np.float32)})["x"]
    np.testing.assert_array_equal(to_host(x), np.arange(8, dtype=np.float32))


def test_host_scalar():
    import jax.numpy as jnp

    from xggm_tpu.parallel.distributed import host_scalar
    assert host_scalar(jnp.float32(3.5)) == 3.5
    assert host_scalar(2.0) == 2.0
    assert host_scalar(np.float32(1.5)) == 1.5
    with pytest.raises((TypeError, ValueError)):
        host_scalar(jnp.arange(4))  # non-scalar
    # replicated jax array (single-process mesh: fully addressable path)
    mesh = make_mesh()
    from xggm_tpu.parallel.mesh import replicate
    r = jax.device_put(np.float32(7.25), replicate(mesh))
    assert host_scalar(r) == 7.25


def test_feeder_requires_mesh_for_multiprocess():
    from xggm_tpu.data.feeder import Feeder
    with pytest.raises(ValueError, match="requires a mesh"):
        Feeder(None, 8, mesh=None, process_index=0, process_count=2)


def test_muted_metrics_logger(tmp_path):
    from xggm_tpu.training.metrics import MetricsLogger
    muted = MetricsLogger(None)
    muted.log_step(0, {"clean_loss": 1.0})
    muted.log_scalar("x", 1.0, 0)
    muted.dump_config({"a": 1})  # all no-ops, nothing written anywhere


def _run_two_hosts(module, argv, marker, _retries=1):
    """Launch `module` twice as cooperating host processes (4 virtual CPU
    devices each) over a fresh localhost coordinator; return both outputs'
    lines containing `marker` (asserting rc=0 and presence).

    Retries once if a host dies in gloo context bootstrap: its rendezvous
    has a hard 30 s timeout inside XLA, and on this single-core machine
    two processes can skew past it under load - an environmental flake,
    not a framework bug (the framework also pre-establishes the context at
    mesh creation to make this window as small as possible)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(HERE)
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_COMPILATION_CACHE_DIR":
               os.path.join(repo, "tests", ".jax_cache")}
    cmd = argv + ["--coordinator", f"127.0.0.1:{port}", "--num_hosts", "2"]
    procs = [subprocess.Popen(
        [sys.executable, "-m", module] + cmd + ["--host_id", str(i)],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            # cold-compile-cache bound: two concurrent full-step compiles on
            # this single-core host take ~25 min each (observed); warm runs
            # finish in ~2 min. 1500 s flaked on a fresh checkout.
            out, _ = p.communicate(timeout=3600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    if (_retries > 0
            and any(p.returncode != 0 for p in procs)
            and any("Gloo context initialization failed" in o for o in outs)):
        return _run_two_hosts(module, argv, marker, _retries - 1)
    marked = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if marker in ln]
        assert lines, out[-2000:]
        marked.append(lines[-1])
    return marked


def test_two_process_cli_end_to_end(tmp_path):
    """The real GQA-OOD CLI as two cooperating host processes (4 virtual
    CPU devices each) over a localhost coordinator: corpus feeding by
    process slice, collective two-phase train steps over the hybrid mesh,
    eval-pred allgather, process-0-gated metrics/log/args files, collective
    BEST checkpointing. The multi-host equivalent of
    tests/test_cli.py::test_multigpu_cli_end_to_end."""
    from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab
    data_root = str(tmp_path / "data")
    os.makedirs(data_root, exist_ok=True)
    # pre-generate once: two workers racing --synthetic writes would corrupt
    for i, split in enumerate(sorted({"train", "val"})):
        make_synthetic_gqa(data_root, split, seed=i)
    write_vocab(os.path.join(data_root, "vocab.txt"))

    output = str(tmp_path / "snap_dist")
    best = _run_two_hosts("xggm_tpu.cli.gqa_ood", [
        "--device", "cpu", "--data_root", data_root, "--output", output,
        "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
        "--gnn", "GCN", "--num_layer", "1",
        "--train", "train", "--valid", "val",
        "--bs", "16", "--optim", "bert", "--lr", "5e-5", "--epochs", "1"],
        marker="Best valid:")
    # both hosts see the same allgathered eval -> identical best accuracy
    assert best[0] == best[1], best
    # file side effects written once, by process 0
    assert os.path.exists(os.path.join(output, "args.json"))
    assert os.path.exists(os.path.join(output, "metrics.jsonl"))
    assert any(f.startswith("BEST") for f in os.listdir(output))


def test_two_process_pretrain_cli(tmp_path):
    """Multi-host pretraining through the real CLI: per-process batch
    slices (the pretrainer's featurize-global/ship-local path), replicated
    loss reads, process-0-gated log, collective Epoch/BEST checkpoints."""
    from xggm_tpu.data.synthetic_pretrain import make_synthetic_pretrain
    data_root = str(tmp_path / "data")
    make_synthetic_pretrain(data_root)

    output = str(tmp_path / "snap_pt")
    lines = _run_two_hosts("xggm_tpu.cli.pretrain", [
        "--device", "cpu", "--data_root", data_root, "--output", output,
        "--dtype", "bfloat16",
        "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
        "--train", "mscoco_train", "--valid", "mscoco_train",
        "--taskMaskLM", "--taskMatched", "--taskObjPredict", "--taskQA",
        "--bs", "8", "--epochs", "1", "--lr", "1e-4"],
        marker="Best eval loss:")
    assert lines[0] == lines[1], lines  # identical replicated loss
    assert os.path.exists(os.path.join(output, "Epoch01"))
    assert os.path.exists(os.path.join(output, "BEST_EVAL_LOSS"))


def _run_dist_workers(extra_env=None, timeout=300):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(HERE, "_dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # workers set their own device count
    env.update(extra_env or {})
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out, out[-4000:]
    return outs


def test_two_process_cpu():
    """Two real processes, 4 virtual CPU devices each: distributed init,
    8-device hybrid mesh, per-process feeding, a cross-process collective,
    cross-process fetch, and the Feeder multi-process path."""
    _run_dist_workers()


def test_two_process_zero_sharded_state(tmp_path):
    """Multi-host ZeRO: optimizer state sharded ACROSS the two processes
    (non-addressable leaves), stepped under the layout constraint,
    checkpointed through the collective allgather snapshot, and restored
    back onto the sharded layout."""
    outs = _run_dist_workers(
        extra_env={"XGGM_DW_ZERO_DIR": str(tmp_path / "zero_ckpt")},
        timeout=420)
    for i, out in enumerate(outs):
        assert f"ZERO_OK {i}" in out, out[-4000:]
