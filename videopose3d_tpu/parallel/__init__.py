from videopose3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch_size,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch_size"]
