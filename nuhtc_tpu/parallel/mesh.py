"""Device mesh + sharding helpers (single- and multi-host).

The reference's only parallelism is NCCL data-parallel DDP
(SURVEY.md §2d; reference nuhtc/apis/train.py:90-97, tools/train.py:136).
The TPU-native equivalent: a 1-D ``Mesh(('data',))`` — batch sharded on
'data', params/optimizer state replicated; XLA inserts the gradient
all-reduce over ICI (and DCN across hosts). WSI tile streams shard the
tile axis the same way (tiles are independent → embarrassingly parallel,
SURVEY.md §5).

Multi-host: ``init_distributed()`` (the ``mmcv init_dist`` analog,
reference tools/train.py:136) before ``make_mesh()``; ``shard_batch``
then assembles global arrays from per-process local batches, and
``gather_objects`` is the ``collect_results_gpu``/process-allgather
analog (reference mmdet multi_gpu_test, tools/test.py:239) for pulling
per-process eval results onto every host.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host initialization (``jax.distributed.initialize``).

    With no arguments, relies on the standard cluster auto-detection env
    (TPU pod metadata / ``JAX_COORDINATOR_ADDRESS`` etc.). Safe to call
    when already initialized or single-process (returns process count).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process without coordinator
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Put a host batch onto the mesh, sharded along the leading axis.

    Single-process: a plain sharded device_put. Multi-process: each
    process holds its LOCAL batch shard; ``make_array_from_process_local_data``
    assembles the global array (global batch = local batch × process count
    along ``axis``)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def gather_objects(obj: Any) -> List[Any]:
    """All-gather an arbitrary picklable object across processes → list of
    per-process objects, ordered by process index (every host gets all).

    Single-process: ``[obj]``. Multi-process: pickled bytes are padded to
    the max length and exchanged with ``multihost_utils.process_allgather``
    (the device-collective analog of the reference's
    ``collect_results_gpu``, mmdet/apis/test.py)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    n = np.asarray([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n)  # (P, 1)
    max_len = int(sizes.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (P, max_len)
    out = []
    for i in range(gathered.shape[0]):
        out.append(pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes()))
    return out


def merge_strided_results(parts: Sequence[Sequence[Any]]) -> List[Any]:
    """Merge per-process (index, result) lists back into dataset order.

    Processes stride the dataset (``idxs = pid::nproc``, reference
    tools/test.py:239 multi-GPU collect), so per-process lists have uneven
    lengths when ``n % nproc != 0``; the merged list is sorted by the
    original index. Input: ``gather_objects(list(zip(my_idxs, results)))``."""
    merged = sorted((pair for part in parts for pair in part), key=lambda p: p[0])
    return [r for _, r in merged]


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
