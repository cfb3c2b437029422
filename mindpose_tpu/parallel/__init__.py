from .mesh import (
    create_mesh,
    data_sharding,
    gather_records,
    init_distributed,
    is_main_process,
    local_device_count,
    replicated_sharding,
)
from .fsdp import (
    build_fsdp_train_step,
    fsdp_batch_spec,
    fsdp_spec,
    fsdp_state_shardings,
    replicate_sharded,
    shard_train_state,
)
from .train import (
    TrainState,
    build_ema_update,
    build_train_step,
    create_train_state,
    shard_batch,
)
