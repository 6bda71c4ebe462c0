from vickers_tpu.parallel.dp import (
    make_dp_train_step,
    make_spmd_infer_fn,
    replicate,
    shard_batch,
)

__all__ = ["make_dp_train_step", "make_spmd_infer_fn", "replicate", "shard_batch"]
