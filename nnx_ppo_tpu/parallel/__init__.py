from nnx_ppo_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharded,
    constrain_batch,
    constrain_time_batch,
    distributed_initialize,
    global_device_put,
    make_mesh,
    replicated,
    shard_training_state,
    training_state_shardings,
)
from nnx_ppo_tpu.parallel.permutation import minibatch_permutations

__all__ = [
    "DATA_AXIS",
    "batch_sharded",
    "constrain_batch",
    "constrain_time_batch",
    "distributed_initialize",
    "global_device_put",
    "make_mesh",
    "minibatch_permutations",
    "replicated",
    "shard_training_state",
    "training_state_shardings",
]
