"""Device mesh and sharding helpers.

The reference is single-GPU (SURVEY.md §2.8: hard-coded device='cuda',
engine/train.py:26).  This module is the new first-class scale-out
component: a 1-D 'data' mesh for batch-parallel training (gradient
all-reduce compiled by XLA over ICI), extensible to ('data', 'model') for
larger models.  Host data feeding uses jax.device_put with a NamedSharding
so each chip receives only its shard.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple = (), axis_names: tuple = ("data",)) -> Mesh:
    """Create a device mesh.  Empty shape => all devices on one data axis."""
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


def make_mesh_for_batch(batch_size: int, shape: tuple = ()) -> Mesh:
    """1-D data mesh using the largest device count dividing batch_size."""
    if shape:
        return make_mesh(shape)
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh((n,))
