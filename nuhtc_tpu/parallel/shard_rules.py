"""GSPMD model-axis sharding rules (beyond-reference: the reference's only
parallelism is NCCL data-parallel DDP — SURVEY.md §2d — but the TPU-native
scaling story is a 2-D ``Mesh(('data', 'model'))``: batch sharded on 'data',
large parameters sharded on 'model', XLA/GSPMD inserting the collectives.

Under GSPMD, sharding a weight's dimension is the single annotation behind
both classic strategies: the partitioner either keeps the matmul partitioned
(tensor-parallel — activations pick up the matching sharding, a
reduce-scatter/all-reduce closes the contraction) or all-gathers the weight
just-in-time (FSDP/ZeRO-3 — parameters, gradients and AdamW moments live
sharded, cutting per-chip optimizer memory by the model-axis size). The
choice is made per-op by the XLA partitioner; numerics are identical up to
float reassociation, which is what the parity test pins
(tests/test_parallel.py::test_gspmd_2d_mesh_matches_single_device).

The rule is shape-based, so the SAME function shards every leaf of the
whole TrainState — params, EMA params, and the AdamW mu/nu moments (which
mirror param shapes) land on identical layouts, scalars and small vectors
stay replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# don't bother sharding anything smaller than this (bytes are ~4x this):
# biases, LayerNorm scales, anchors — replication is cheaper than the
# collective traffic
MIN_SHARD_ELEMS = 65536


def make_mesh_2d(n_data: int, n_model: int,
                 axes: tuple = ("data", "model")) -> Mesh:
    """2-D device mesh: 'data' major (DCN/outer ICI), 'model' minor (inner
    ICI) — model-axis collectives ride the fastest links."""
    devs = jax.devices()
    need = n_data * n_model
    assert len(devs) >= need, (len(devs), need)
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_model), axes)


def leaf_spec(shape, n_model: int, axis: str = "model",
              min_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec for one array: shard the largest ``n_model``-divisible
    dim on the model axis, preferring trailing dims on ties (the lane/minor
    dims XLA lays out contiguously — e.g. conv HWIO kernels shard O, fc
    kernels shard their output features)."""
    if n_model <= 1 or int(np.prod(shape)) < min_elems:
        return P()
    best = None
    for d in range(len(shape) - 1, -1, -1):
        if shape[d] % n_model == 0 and (best is None or shape[d] > shape[best]):
            best = d
    if best is None:
        return P()
    spec: list[Optional[str]] = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def tree_shardings(tree: Any, mesh: Mesh, axis: str = "model",
                   min_elems: int = MIN_SHARD_ELEMS) -> Any:
    """NamedSharding pytree for an arbitrary state tree (shape-based rule —
    see module docstring). Works on concrete arrays or ShapeDtypeStructs."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)

    def f(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return NamedSharding(mesh, leaf_spec(x.shape, n_model, axis, min_elems))
        return NamedSharding(mesh, P())

    return jax.tree.map(f, tree)


def shard_state(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put the train state onto the mesh under the model-sharding
    rule (params/EMA/moments sharded, scalars replicated)."""
    shardings = tree_shardings(state, mesh, axis)
    return jax.tree.map(jax.device_put, state, shardings)
