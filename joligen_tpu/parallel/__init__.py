from .dist import initialize_distributed, is_main_process
from .mesh import (batch_sharding, make_mesh, param_sharding, put_global,
                   replicate, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "param_sharding", "shard_batch",
           "replicate", "put_global", "initialize_distributed",
           "is_main_process"]
