from cfnerf_tpu.parallel.mesh import (
    create_mesh,
    ray_sharding,
    replicated_sharding,
    shard_batch,
)
