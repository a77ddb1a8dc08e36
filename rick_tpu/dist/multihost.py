"""Multi-host runtime helpers.

The reference's multi-process path is vestigial torch.distributed scaffolding
(`distributed.py:9-126`, never initialized).  The TPU equivalent is the JAX
multi-controller runtime: call `initialize_multihost()` once per process
before any backend use; build the global mesh over `jax.devices()`; feed each
process its own shard of the global batch (`process_batch_slice`)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

# Environment variables whose presence indicates a multi-process launch with
# automatic coordination (JAX's own cluster-detection inputs: its coordination
# service var, TPU pod metadata, or the common MPI/Slurm launchers).
_AUTO_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """jax.distributed.initialize wrapper; returns (process_index, process_count).

    With no arguments, initializes via JAX's automatic cluster discovery when
    the environment shows multi-process coordination variables (TPU pod
    metadata, Slurm, OpenMPI, or an explicit coordinator address); plain
    single-process runs stay a no-op.  Mirrors the capability the reference
    scaffolds but never wires up (`distributed.py:9-41`)."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        elif num_processes is not None or process_id is not None:
            jax.distributed.initialize(
                num_processes=num_processes, process_id=process_id
            )
        elif _env_is_multiprocess():
            # multi-process launch detected: let jax's cluster auto-detection
            # resolve the coordinator/process topology
            jax.distributed.initialize()
    except RuntimeError:
        pass  # already initialized
    except ValueError as e:
        # auto-detection could not resolve a coordinator (e.g. a tunnel sets
        # TPU_WORKER_HOSTNAMES=localhost): stay single-process rather than die
        print(f"initialize_multihost: auto-detect failed ({e}); single-process", flush=True)
    return jax.process_index(), jax.process_count()


def _env_is_multiprocess() -> bool:
    """True only when the environment positively indicates >1 process --
    single-worker values (TPU_WORKER_HOSTNAMES=localhost, SLURM 1 node, ...)
    must NOT trigger distributed init."""
    if any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    ):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hosts:
        return True
    for v in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(v, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def process_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this process's slice of the global batch, matching a
    batch-major NamedSharding over the 'data' mesh axis."""
    pc = jax.process_count()
    pi = jax.process_index()
    if global_batch % pc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} processes")
    per = global_batch // pc
    return pi * per, per


def global_array_from_local(mesh, local_batch, axis_name: str = "data"):
    """Assemble the global batch array from this process's local slice.

    Single-process: a plain sharded device_put (identical to
    `dist.mesh.shard_batch`).  Multi-process: each process contributes its
    `process_batch_slice`-sized rows and jax assembles the global array over
    the multi-host mesh -- the tpu-native version of the per-rank DataLoader
    feeding the reference's DataParallel wrapper
    (`train_dynamic_update_prune.py:941-944`)."""
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def is_main_process() -> bool:
    """rank-0 guard for file writes / logging (the reference's
    `get_rank() == 0` checks, `train_dynamic_update_prune.py:605,947`)."""
    return jax.process_index() == 0


# The reference's collective helpers (`distributed.py:44-126`) map to in-jit
# lax collectives under the data mesh; provided for API parity:


def reduce_sum(x, axis_name: str = "data"):
    """all_reduce SUM (`distributed.py:44-54`) -- inside shard_map/jit."""
    return jax.lax.psum(x, axis_name)


def reduce_mean(x, axis_name: str = "data"):
    """gather_grad-style mean (`distributed.py:57-66`)."""
    return jax.lax.pmean(x, axis_name)
