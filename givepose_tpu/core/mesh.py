"""Device mesh and sharding helpers.

The reference is single-GPU (SURVEY.md §2.8: hard-coded device='cuda',
engine/train.py:26).  This module is the new first-class scale-out
component: a 1-D 'data' mesh for batch-parallel training (gradient
all-reduce compiled by XLA over ICI), extensible to ('data', 'model') for
larger models.  Host data feeding uses jax.device_put with a NamedSharding
so each chip receives only its shard.

Multi-host: ``initialize_distributed`` brings up the jax.distributed
runtime (one process per host; ``jax.devices()`` then spans all hosts so
``make_mesh`` builds a global mesh whose collectives ride ICI within a
slice).  ``shard_host_batch`` assembles a global array from each process's
LOCAL shard, and ``process_local_indices`` splits an epoch's sample
indices across feeder processes.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-process runtime init (DCN scale-out).

    On managed TPU pods jax.distributed auto-discovers everything; on
    other clusters pass the coordinator explicitly or set the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    Returns True if the distributed runtime was started, False for the
    plain single-process path (no-op, safe to call unconditionally).
    """
    from jax._src import xla_bridge

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = (num_processes if num_processes is not None
                     else int(env_np) if env_np else None)
    process_id = (process_id if process_id is not None
                  else int(env_pid) if env_pid else None)
    # strictly opt-in: only when a coordinator is named, and only before
    # any backend came up (managed pod launchers initialize themselves)
    if coordinator_address is None or xla_bridge.backends_are_initialized():
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(shape: tuple = (), axis_names: tuple = ("data",)) -> Mesh:
    """Create a device mesh.  Empty shape => all devices on one data axis.

    After ``initialize_distributed`` this spans every process's chips.
    """
    devices = jax.devices()
    if not shape:
        shape = (len(devices),)
    devs = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axis_names[: len(shape)])


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree so dim0 of every leaf is sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def shard_host_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble a GLOBAL batch from this process's LOCAL shard.

    Each feeder process loads only its slice of the global batch (see
    ``process_local_indices``); leaves here have the local length and are
    stitched into global jax.Arrays sharded over 'data'.  Single-process
    this degenerates to ``shard_batch``.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), batch)


def process_local_indices(indices: np.ndarray, global_batch_size: int,
                          process_id: int | None = None,
                          num_processes: int | None = None) -> np.ndarray:
    """Per-process slice of an epoch's sample indices.

    Global batch t is ``indices[t*B:(t+1)*B]``; ``shard_host_batch``
    stitches the global array as the concatenation of each process's
    local batch, so process p must feed the p-th contiguous chunk of
    every global batch.  This keeps the multi-process run numerically
    identical to a single process consuming ``indices`` directly.
    """
    pid = process_id if process_id is not None else jax.process_index()
    n = num_processes if num_processes is not None else jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    steps = len(indices) // global_batch_size
    local = global_batch_size // n
    grid = indices[: steps * global_batch_size].reshape(
        steps, n, local)
    return grid[:, pid, :].ravel()


def make_mesh_for_batch(batch_size: int, shape: tuple = ()) -> Mesh:
    """1-D data mesh using the largest device count dividing batch_size."""
    if shape:
        return make_mesh(shape)
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh((n,))
