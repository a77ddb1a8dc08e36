"""Data-parallel mesh and sharding helpers.

The reference's parallelism is single-process DataParallel plus vestigial DDP
shims (`train_dynamic_update_prune.py:941-944`, `distributed.py`).  The
TPU-native equivalent: a 1-D `data` mesh; the global batch is sharded along
it, parameters are replicated, and XLA inserts the gradient/metric collectives
implied by the global-batch math (means over the batch == cross-device psum)
-- riding ICI within a slice.  Multi-host: `jax.distributed.initialize()`
before mesh construction; each host feeds its `process_index` shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a global NCHW batch sharded along the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
