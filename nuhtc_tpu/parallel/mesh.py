"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP
(SURVEY.md §2d; reference nuhtc/apis/train.py:90-97, tools/train.py:136).
The TPU-native equivalent: a 1-D ``Mesh(('data',))`` — batch sharded on
'data', params/optimizer state replicated; XLA inserts the gradient
all-reduce over ICI. WSI tile streams shard the tile axis the same way
(tiles are independent → embarrassingly parallel, SURVEY.md §5).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``;
the same code then spans hosts (DCN between slices handled by XLA).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
