from simplenerf_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    process_local_rows,
    replicate,
    replicated_sharding,
    shard_ray_batch,
    shard_ray_batch_local,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "replicate",
    "shard_ray_batch",
    "shard_ray_batch_local",
    "process_local_rows",
    "initialize_distributed",
]
