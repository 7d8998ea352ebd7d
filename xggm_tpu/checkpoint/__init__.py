from xggm_tpu.checkpoint.torch_bridge import (
    convert_lxrt_bert, convert_task_model, load_torch_state_dict,
    strip_prefixes,
)
from xggm_tpu.checkpoint.manager import CheckpointManager
