from pixparse_tpu.parallel.mesh import (
    DEFAULT_LOGICAL_RULES,
    MeshEnv,
    create_mesh,
    logical_sharding,
    shard_batch,
)
