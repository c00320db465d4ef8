from avmoe_tpu.parallel.mesh import (
    batch_sharding,
    expert_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["batch_sharding", "expert_sharding", "make_mesh", "replicate",
           "shard_batch"]
