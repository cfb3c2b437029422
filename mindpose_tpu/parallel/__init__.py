from .mesh import (
    create_mesh,
    data_sharding,
    gather_records,
    init_distributed,
    is_main_process,
    local_device_count,
    replicated_sharding,
)
from .train import TrainState, build_train_step, create_train_state, shard_batch
