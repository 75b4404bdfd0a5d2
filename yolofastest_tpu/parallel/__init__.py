from yolofastest_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "replicate", "shard_batch"]
