from lavila_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, batch_sharding, replicate, shard_batch, shard_params,
)
from lavila_tpu.parallel.sharding import param_sharding_rules  # noqa: F401
