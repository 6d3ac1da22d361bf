from planedepth_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    jit_eval_step,
    jit_train_step,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
