from yolofastest_tpu.parallel.distributed import (
    global_batch_size,
    host_to_global,
    init_distributed,
)
from yolofastest_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "global_batch_size",
    "host_to_global",
    "init_distributed",
    "make_mesh",
    "replicate",
    "shard_batch",
]
