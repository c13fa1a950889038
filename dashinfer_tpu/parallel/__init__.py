from dashinfer_tpu.parallel.mesh import make_mesh
from dashinfer_tpu.parallel.sharding import (cache_sharding, param_shardings,
                                             shard_cache, shard_params,
                                             shard_state)

__all__ = ["make_mesh", "param_shardings", "shard_params", "cache_sharding",
           "shard_cache", "shard_state"]
