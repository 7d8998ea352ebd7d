from xggm_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, batch_sharding, host_to_device,
    param_shardings, zero_state_shardings, apply_state_shardings,
)
from xggm_tpu.parallel.distributed import (
    init_distributed, make_hybrid_mesh, local_batch_to_global,
    process_slice, to_host, host_scalar,
)
from xggm_tpu.parallel.pipeline import (
    gpipe_apply, sequential_apply, stack_stages,
)
from xggm_tpu.parallel.pipeline_lxmert import (
    build_superset_stack, pipelined_lxr_stack, set_pipeline_mesh,
    clear_pipeline_mesh,
)
