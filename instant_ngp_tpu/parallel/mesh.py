"""Device mesh + sharding utilities (data-parallel first).

Model scale in this framework is tiny (hash table ≈ 10-50 MB, MLPs < 100 kB)
so parameters replicate; the batch (rays/samples/pixels) shards over the
`data` axis. These helpers centralize NamedSharding boilerplate so testbeds
stay readable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def replicate(mesh: Mesh, tree):
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along(mesh: Mesh, tree, axis_name: str = "data", dim: int = 0):
    """Shard every leaf's `dim` over the mesh axis; other dims replicated."""

    def put(x):
        spec = [None] * np.ndim(x)
        spec[dim] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Shard arrays over their leading (batch) dimension."""
    return shard_along(mesh, batch, axis_name, dim=0)
