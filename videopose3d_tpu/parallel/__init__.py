from videopose3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch_size,
    initialize_distributed,
    process_info,
    global_batch_array,
    replicated_array,
    host_array_to_global,
    local_replica,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch_size", "initialize_distributed", "process_info",
           "global_batch_array", "replicated_array", "host_array_to_global",
           "local_replica"]
