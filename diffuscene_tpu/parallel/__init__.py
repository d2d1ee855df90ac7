from .mesh import batch_sharding, make_mesh, replicate, replicated, shard_batch
from .sampler import ShardedSampler
from .distributed import (
    global_batch_from_host_local,
    host_local_slice,
    initialize,
    shard_indices_for_host,
)
from .tp import param_shardings, shard_params
