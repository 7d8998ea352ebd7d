"""Multi-host SPMD runtime: jax.distributed + DCN x ICI hybrid meshes.

The reference's parallelism ceiling is single-process `nn.DataParallel`
(reference src/lxrt/entry.py:103-104); SURVEY.md §5.8 names the TPU-native
design for going past one host: the standard JAX distributed runtime -
every host runs the same program, `jax.distributed.initialize` forms the
global runtime, each host feeds its local shard of the batch, and XLA
routes gradient all-reduces over ICI within a slice and DCN across slices.
This module is that layer:

  * `init_distributed()`   - process bootstrap (no-op single-process; on
    TPU pods the coordinator/process topology autodetects from the
    environment, elsewhere it is passed explicitly);
  * `make_hybrid_mesh()`   - ('data', 'model') mesh where the data axis is
    ordered DCN-outermost / ICI-innermost
    (`mesh_utils.create_hybrid_device_mesh`), so the per-step gradient
    all-reduce decomposes into fast intra-slice ICI reduce-scatters plus a
    small cross-slice DCN phase - XLA derives that from device order alone;
  * `local_batch_to_global()` - the multi-host feeder primitive: each
    process contributes the rows it owns and gets back global jax.Arrays
    sharded P('data') (`jax.make_array_from_process_local_data`), without
    any host ever materializing the full global batch;
  * `to_host()`            - fetch results that may not be fully
    addressable from this process (cross-host allgather of eval preds,
    replacing DataParallel's output gather).

Single-process behavior is exactly the existing single-host path (the
virtual 8-device CPU mesh in tests exercises the same code), so the
trainer/feeder use these primitives unconditionally when a mesh is present.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None,
                     auto: bool = False) -> tuple[int, int]:
    """Join (or skip joining) the JAX distributed runtime.

    Returns (process_index, process_count). Call before any other jax use.
    Three modes:
      * nothing given -> single-process no-op;
      * `auto=True` on a TPU pod / SLURM job -> bare
        `jax.distributed.initialize()`, topology autodetected from the
        cluster metadata (opt-in rather than env-sniffed: single-chip TPU
        environments also carry TPU_* variables);
      * explicit coordinator/num_processes/process_id -> any transport
        (including multi-process CPU, which is how tests drive this).
    """
    explicit = coordinator_address is not None or num_processes is not None
    if not explicit and not auto:
        return jax.process_index(), jax.process_count()
    if num_processes is not None and num_processes <= 1:
        return 0, 1
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def make_hybrid_mesh(model_parallel: int = 1,
                     devices: Optional[Sequence[Any]] = None) -> Mesh:
    """('data', 'model') mesh over all processes' devices, data axis ordered
    DCN-outermost so cross-slice traffic is the slow-link-sized residue.

    The 'model' axis always lives inside one ICI domain (tensor-parallel
    collectives are per-layer and latency-bound; putting them on DCN would
    serialize every matmul on the slow link). Single-process, this reduces
    to `mesh.make_mesh` over the local devices.
    """
    if devices is None:
        devices = jax.devices()
    n_granules = len({d.process_index for d in devices})
    if n_granules <= 1:
        from xggm_tpu.parallel.mesh import make_mesh
        return make_mesh(model_parallel=model_parallel, devices=devices)
    per_granule = len(devices) // n_granules
    if per_granule % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the per-host "
            f"device count {per_granule}: the model axis cannot span DCN")
    from jax.experimental import mesh_utils
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_granule // model_parallel, model_parallel),
        dcn_mesh_shape=(n_granules, 1),
        devices=devices, process_is_granule=True)
    mesh = Mesh(grid, ("data", "model"))
    # Establish the cross-host collective contexts NOW, while every process
    # sits at the same program point. XLA's CPU-gloo backend bootstraps one
    # context per device CLIQUE at the first collective that uses it, with
    # a hard 30 s rendezvous; once established, a clique's context is
    # reused by every later executable (verified: a second collective
    # survives 60 s of deliberate dispatch skew). Without this, the first
    # real collective bootstraps only after each host's first jit compile,
    # which can skew hosts past 30 s (cold compile caches: minutes) and
    # kill the run. Order matters:
    #   1. KV barrier - the coordination-service barrier tolerates minutes
    #      of startup skew (imports, dataset mmap), so the bootstraps below
    #      start from millisecond-level alignment;
    #   2. full-mesh psum - establishes the all-devices clique that the
    #      train/eval steps' gradient all-reduces use;
    #   3. sync_global_devices - establishes the one-device-per-process
    #      clique that process_allgather/to_host use.
    host_barrier("hybrid_mesh_init")
    n = int(grid.size)
    sh_in = NamedSharding(mesh, P(mesh.axis_names[0]))
    ones = jax.device_put(np.ones(n, np.float32), sh_in)
    total = jax.jit(lambda v: v.sum(),
                    out_shardings=NamedSharding(mesh, P()))(ones)
    got = float(np.asarray(total.addressable_data(0)))
    if got != float(n):  # also a cheap end-to-end collective self-check
        raise RuntimeError(f"mesh warmup all-reduce returned {got}, "
                           f"expected {n}")
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("xggm:hybrid_mesh_init")
    return mesh


def host_barrier(name: str, timeout_s: int = 1800) -> None:
    """Align every process at a named program point through the
    coordination service (the jax.distributed KV store) - a host-side
    barrier with a configurable, minutes-scale timeout.

    Use this instead of `multihost_utils.sync_global_devices` wherever the
    point being aligned may be reached with large host skew: sync runs a
    device collective, whose CPU-gloo context bootstrap allows only a hard
    30 s rendezvous, so it *crashes* in exactly the situations a barrier
    is for. No-op single-process.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist
    client = getattr(_dist.global_state, "client", None)
    if client is None:  # initialized outside jax.distributed (unexpected)
        return
    client.wait_at_barrier(f"xggm:{name}", timeout_s * 1000)


def local_batch_to_global(mesh: Mesh, local_batch, global_batch_size: int):
    """Assemble global P('data')-sharded arrays from per-process rows.

    Every process passes the `global_batch_size // process_count` rows it
    owns (leading dim); the returned jax.Arrays have global leading dim
    `global_batch_size`. Single-process this is exactly
    `mesh.shard_batch`. Processes must call this collectively with
    identical tree structure/shapes.
    """
    sh = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, global_shape=(global_batch_size,) + x.shape[1:])

    return jax.tree.map(place, local_batch)


def process_slice(rows, process_index: int, process_count: int):
    """The contiguous leading-dim chunk of a global batch this process
    feeds (an index list or a data array - basic slicing, zero-copy).

    `local_batch_to_global` requires each process to own the rows that
    P('data') places on its devices: with a DCN-outermost data axis those
    are exactly the `pid`-th contiguous chunk of the global batch.
    """
    n = len(rows)
    if n % process_count != 0:
        raise ValueError(f"global batch {n} not divisible by "
                         f"process_count {process_count}")
    local = n // process_count
    return rows[process_index * local:(process_index + 1) * local]


def to_host(x) -> np.ndarray:
    """Fetch an array to THIS host, allgathering shards other processes
    hold (eval preds under multi-host DP; reference relied on
    DataParallel's in-process output gather, entry.py:103-104)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        # every process holds a full replica - read it locally, no network
        return np.asarray(x.addressable_shards[0].data)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def host_scalar(x) -> float:
    """Host float of a scalar step metric (loss values etc.).

    Under multi-host, jit outputs with no out-sharding are replicated but
    still span non-addressable devices, so plain float()/np.asarray raises;
    the local shard IS the global value. Raises TypeError for sharded
    non-replicated arrays (eval preds and the like are not scalar metrics).
    """
    if not getattr(x, "is_fully_addressable", True):
        if not x.sharding.is_fully_replicated:
            raise TypeError("sharded array is not a scalar metric")
        x = x.addressable_shards[0].data
    return float(np.asarray(x).reshape(()))
