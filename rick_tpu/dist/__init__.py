"""L6: device mesh construction, sharding helpers, multi-host runtime.

TPU-native equivalent of the reference's DataParallel wrap + torch.distributed
shims (`train_dynamic_update_prune.py:941-944`, `distributed.py:9-126`).
"""

from rick_tpu.dist.mesh import make_mesh, shard_batch, replicate, local_batch_size
from rick_tpu.dist.multihost import (
    global_array_from_local,
    initialize_multihost,
    is_main_process,
    process_batch_slice,
    reduce_mean,
    reduce_sum,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "local_batch_size",
    "initialize_multihost",
    "global_array_from_local",
    "is_main_process",
    "process_batch_slice",
    "reduce_sum",
    "reduce_mean",
]
