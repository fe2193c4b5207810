"""Semi-supervised teacher/student training wiring (reference
nuhtc/models/multi_stream_detector.py + nuhtc/utils/hooks/mean_teacher.py):
SemiTrainState + make_semi_train_step over a tiny MaskRCNN, the
SemiPrefetchLoader batch contract, and the Weighter loss re-weighting hook.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nuhtc_tpu.models.mask_rcnn import MaskRCNN
from nuhtc_tpu.models.semi import MultiStreamDetector
from nuhtc_tpu.train.train_state import (
    create_semi_train_state,
    make_semi_train_step,
)

TINY_BACKBONE = dict(
    embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=7
)


@pytest.fixture(scope="module")
def tiny_semi():
    model = MaskRCNN(
        num_classes=4,
        fpn_channels=32,
        backbone_cfg=TINY_BACKBONE,
        rpn_nms_pre=128,
        rpn_max_per_img=64,
        rcnn_max_per_img=16,
        nms_candidates=128,
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
    return model, params


def _semi_batch(b=1, g=8, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(8, w - 8, (b, g))
    cy = rng.uniform(8, h - 8, (b, g))
    half = rng.uniform(3, 6, (b, g))
    boxes = np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32)
    unsup = rng.rand(b, h, w, 3).astype(np.float32) * 255
    return dict(
        img=jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 4, (b, g)), dtype=jnp.int32),
        gt_valid=jnp.asarray(np.ones((b, g), bool)),
        gt_patches=jnp.asarray(np.ones((b, g, 64, 64), np.float32)),
        gt_semantic=jnp.asarray(rng.randint(0, 2, (b, h // 4, w // 4)), dtype=jnp.int32),
        gt_ismask=jnp.asarray(np.ones((b, g), np.float32)),
        unsup_img=jnp.asarray(unsup),
        unsup_img_teacher=jnp.asarray(np.clip(unsup + 5.0, 0, 255)),
    )


def test_semi_train_step_runs_and_updates_teacher(tiny_semi):
    model, params = tiny_semi
    wrapper = MultiStreamDetector(model, score_thr=0.5, max_gt=16)
    state, tx = create_semi_train_state(model, params, num_stages=1, num_classes=4)
    step_fn = jax.jit(
        make_semi_train_step(
            wrapper, tx, teacher_momentum=0.999, teacher_warmup=100,
            unsup_weight=2.0, burn_in=0, finetune_iter=0,
        )
    )
    batch = _semi_batch()
    rng = jax.random.PRNGKey(1)

    state1, metrics = step_fn(state, batch, rng)
    assert int(state1.step) == 1
    # sup + unsup loss streams both present and finite
    assert any(k.startswith("sup.") for k in metrics)
    assert any(k.startswith("unsup.") for k in metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # warmup momentum at step 0 is min(0.999, 1 - 101/101) = 0 → teacher
    # is a clone of the fresh student (reference MeanTeacher warm_up ramp)
    t_leaf = jax.tree.leaves(state1.teacher_params)[0]
    s_leaf = jax.tree.leaves(state1.student_params)[0]
    np.testing.assert_allclose(np.asarray(t_leaf), np.asarray(s_leaf), rtol=1e-6)

    state2, metrics2 = step_fn(state1, batch, rng)
    # at step 1 momentum > 0 → teacher lags the student
    t2 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state2.teacher_params)])
    s2 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state2.student_params)])
    assert float(metrics2["ema_momentum"]) > 0
    # teacher lags the student by m·(update) — tiny but strictly nonzero
    assert np.max(np.abs(t2 - s2)) > 0
    # and the teacher moved from its step-1 snapshot
    t1 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state1.teacher_params)])
    assert np.max(np.abs(t1 - t2)) > 0


def test_semi_burn_in_zeroes_unsup_weight(tiny_semi):
    model, params = tiny_semi
    wrapper = MultiStreamDetector(model, score_thr=0.5, max_gt=16)
    state, tx = create_semi_train_state(model, params, num_stages=1, num_classes=4)
    step_fn = jax.jit(
        make_semi_train_step(
            wrapper, tx, teacher_momentum=0.999, unsup_weight=2.0,
            burn_in=10, finetune_iter=0,
        )
    )
    batch = _semi_batch()
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    # during burn-in total == supervised total (unsup branch weighted 0)
    np.testing.assert_allclose(
        float(metrics["total"]), float(metrics["sup.total"]), rtol=1e-5
    )


def test_eval_submodules_selects_teacher_student(tiny_semi):
    from nuhtc_tpu.train.trainer import Trainer

    model, params = tiny_semi
    state, _ = create_semi_train_state(model, params, num_stages=1, num_classes=4)
    tr = Trainer.__new__(Trainer)  # no filesystem side effects
    tr.cfg = {"evaluated_modules": ["teacher", "student"]}

    class _L:
        def warning(self, *a, **k):
            pass

    tr.logger = _L()
    sel = tr._eval_submodules(state)
    assert set(sel) == {"teacher", "student"}


def test_semi_prefetch_loader_batch_contract(tmp_path):
    from nuhtc_tpu.data.loader import SemiDataset, SemiPrefetchLoader

    class _DS:
        def __init__(self, n=4, h=48, w=48):
            self.n, self.h, self.w = n, h, w
            self.CLASSES = ("a", "b")

        def __len__(self):
            return self.n

        def load_image(self, i):
            rng = np.random.RandomState(i)
            return (rng.rand(self.h, self.w, 3) * 255).astype(np.float32)

        def get_ann_info(self, i):
            return dict(
                bboxes=np.asarray([[4.0, 4.0, 20.0, 20.0]], np.float32),
                labels=np.asarray([0], np.int64),
                masks=[],
            )

        def load_semantic(self, i):
            return np.zeros((self.h, self.w), np.uint8)

    # empty masks path: gt_masks comes back as (0, H, W)
    semi = SemiDataset(_DS(), _DS(n=6, h=64, w=64))
    loader = SemiPrefetchLoader(semi, pipeline=[], batch_size=4, sup_ratio=0.5,
                                num_threads=1, prefetch=1)
    batch = next(iter(loader))
    loader.close()
    assert batch["img"].shape[0] == 2  # sup half
    assert batch["unsup_img"].shape == batch["unsup_img_teacher"].shape
    assert batch["unsup_img"].shape[0] == 2  # unsup half
    # unsup views are spatially aligned with the sup batch
    assert batch["unsup_img"].shape[1:3] == batch["img"].shape[1:3]
    # strong view is a photometric perturbation of the weak view (same shape,
    # generally different values)
    assert batch["unsup_img"].dtype == np.float32


def test_semi_weighter_applies_per_branch(tiny_semi):
    """The Weighter hook must act on each branch BEFORE combination: schedule
    keys match the raw term names ("loss_rpn_cls", not "sup.loss_rpn_cls"),
    and the combined total keeps burn-in gating (round-2 advisor finding:
    applied post-combination it double-counted the branch totals and
    bypassed the burn-in/unsup_weight gate)."""
    from nuhtc_tpu.utils.hooks import build_weighter

    model, params = tiny_semi
    wrapper = MultiStreamDetector(model, score_thr=0.5, max_gt=16)
    batch = _semi_batch()
    rng = jax.random.PRNGKey(1)

    def run(weighter):
        state, tx = create_semi_train_state(model, params, num_stages=1, num_classes=4)
        step_fn = jax.jit(
            make_semi_train_step(
                wrapper, tx, teacher_momentum=0.999, unsup_weight=2.0,
                burn_in=10, finetune_iter=0, weighter=weighter,
            )
        )
        _, metrics = step_fn(state, batch, rng)
        return metrics

    base = run(None)
    scaled = run(build_weighter({"loss_rpn_cls": 4.0}))
    # the schedule key matched the raw per-branch name
    np.testing.assert_allclose(
        float(scaled["sup.loss_rpn_cls"]), 4.0 * float(base["sup.loss_rpn_cls"]),
        rtol=1e-5,
    )
    # burn-in gating survives re-weighting: total == re-weighted sup total
    np.testing.assert_allclose(
        float(scaled["total"]), float(scaled["sup.total"]), rtol=1e-5
    )
    # and the sup total was itself recomputed from the re-weighted terms
    expect = float(base["sup.total"]) + 3.0 * float(base["sup.loss_rpn_cls"])
    np.testing.assert_allclose(float(scaled["sup.total"]), expect, rtol=1e-5)


def test_weighter_excludes_aggregate_keys():
    from nuhtc_tpu.utils.hooks import build_weighter

    w = build_weighter({"loss_a": 2.0})
    losses = {"loss_a": jnp.float32(1.0), "sup.total": jnp.float32(5.0),
              "total": jnp.float32(1.0)}
    out = w(losses, jnp.int32(0))
    # ".total"-suffixed aggregates are reported, never summed: the new total
    # is just the re-weighted loss_a
    np.testing.assert_allclose(float(out["total"]), 2.0)
    np.testing.assert_allclose(float(out["sup.total"]), 5.0)


def test_weighter_piecewise_schedule_shapes_total():
    from nuhtc_tpu.utils.hooks import build_weighter

    w = build_weighter({"loss_a": dict(steps=[10], vals=[0.5, 2.0]), "loss_b": 3.0})
    losses = {"loss_a": jnp.float32(1.0), "loss_b": jnp.float32(1.0),
              "total": jnp.float32(2.0)}

    def apply(step):
        return w(losses, jnp.int32(step))

    early = jax.jit(apply)(0)
    late = jax.jit(apply)(20)
    np.testing.assert_allclose(float(early["loss_a"]), 0.5)
    np.testing.assert_allclose(float(late["loss_a"]), 2.0)
    np.testing.assert_allclose(float(early["total"]), 0.5 + 3.0)
    np.testing.assert_allclose(float(late["total"]), 2.0 + 3.0)
