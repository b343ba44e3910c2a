from pnnp_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_sharded_train_step,
    make_sharded_noise_step,
    make_eval_metrics_step_sharded,
    spatial_eval,
    spatial_eval_auto,
)
