from gigagan_tpu.parallel.mesh import (
    make_data_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "make_data_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
]
