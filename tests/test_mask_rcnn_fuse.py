"""Smoke + behavior tests for the standalone MaskRCNN family and the
NuHTC _Lite_Fuse inference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nuhtc_tpu.models.mask_rcnn import MaskRCNN
from nuhtc_tpu.models.detector import NuHTC

TINY_BACKBONE = dict(
    embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=7
)


@pytest.fixture(scope="module")
def tiny_maskrcnn():
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


def _tiny_batch(b=2, g=8, h=64, w=64, rng=None):
    rng = rng or np.random.RandomState(0)
    cx = rng.uniform(8, w - 8, (b, g))
    cy = rng.uniform(8, h - 8, (b, g))
    half = rng.uniform(3, 6, (b, g))
    boxes = np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32)
    return dict(
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 4, (b, g)), dtype=jnp.int32),
        gt_valid=jnp.asarray(np.ones((b, g), bool)),
        gt_patches=jnp.asarray(np.ones((b, g, 28, 28), np.float32)),
        gt_semantic=jnp.asarray(rng.randint(0, 2, (b, h // 4, w // 4)), dtype=jnp.int32),
        gt_ismask=jnp.asarray((np.arange(g) % 2 == 0)[None].repeat(b, 0).astype(np.float32)),
    )


def test_maskrcnn_inference_shapes(tiny_maskrcnn):
    model, params = tiny_maskrcnn
    img = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32))
    out = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    assert out["boxes"].shape == (2, 16, 4)
    assert out["labels"].shape == (2, 16)
    assert out["mask_probs"].shape == (2, 16, 28, 28)
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and (mp >= 0).all() and (mp <= 1).all()


def test_maskrcnn_losses_finite_and_partial(tiny_maskrcnn):
    model, params = tiny_maskrcnn
    img = jnp.asarray(np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32))
    batch = _tiny_batch()

    f = jax.jit(
        lambda p, x, b: model.apply(
            p, x, b, method="compute_losses", rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(30)}
        )
    )
    losses = f(params, img, batch)
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox",
              "loss_mask", "loss_mid_seg", "total"):
        v = float(losses[k])
        assert np.isfinite(v), (k, v)

    # gradients flow to the mid-seg conv and mask head
    def total(p):
        l = model.apply(p, x_img, batch, method="compute_losses",
                        rngs={"sampling": jax.random.PRNGKey(3),
                              "dropout": jax.random.PRNGKey(30)})
        return l["total"]

    x_img = img
    grads = jax.jit(jax.grad(total))(params)
    gm = jax.tree.map(lambda a: float(jnp.max(jnp.abs(a))), grads)
    flat = jax.tree_util.tree_leaves_with_path(gm)
    conv_last = [v for k, v in flat if "conv_last" in jax.tree_util.keystr(k)]
    assert conv_last and max(conv_last) > 0


def test_maskrcnn_mask_branch_ignores_boxonly_gt(tiny_maskrcnn):
    """With ismask all-zero, the mask loss has no positives → exactly 0."""
    model, params = tiny_maskrcnn
    img = jnp.asarray(np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32))
    batch = _tiny_batch(b=1)
    batch["gt_ismask"] = jnp.zeros_like(batch["gt_ismask"])
    losses = jax.jit(
        lambda p, x, b: model.apply(
            p, x, b, method="compute_losses", rngs={"sampling": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(50)}
        )
    )(params, img, batch)
    assert float(losses["loss_mask"]) == 0.0
    assert float(losses["loss_cls"]) > 0.0  # bbox branch still trains


def test_nuhtc_fuse_test_shapes():
    model = NuHTC(
        num_classes=3,
        fpn_channels=32,
        backbone_cfg=TINY_BACKBONE,
        lite_fuse=True,
        fuse_max_instances=16,
        scale_factor=2.0,
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
    out = jax.jit(lambda p, x: model.apply(p, x, method="fuse_test"))(params, img)
    assert out["fuse_boxes"].shape == (1, 3, 16, 5)
    assert out["fuse_valid"].shape == (1, 3, 16)
    assert out["fuse_inst"].shape == (1, 3, 32, 32)  # ori frame = input/2
    b5 = np.asarray(out["fuse_boxes"])
    v = np.asarray(out["fuse_valid"])
    if v.any():
        assert (b5[v][:, 4] == np.float32(0.36)).all()


def test_build_detector_dispatches_maskrcnn():
    """configs with type='MaskRCNN' must construct MaskRCNN (not NuHTC) with
    their kwargs applied (regression: type was silently ignored)."""
    from nuhtc_tpu.models.build import build_detector

    m = build_detector(
        dict(type="MaskRCNN", num_classes=8, fpn_channels=32, with_mid_seg=True,
             rcnn_score_thr=0.05, rcnn_max_per_img=100, unknown_key=1)
    )
    assert isinstance(m, MaskRCNN)
    assert m.num_classes == 8 and m.fpn_channels == 32 and m.with_mid_seg
    assert m.mask_thr_binary == 0.5


def test_maskrcnn_losses_cum_passthrough(tiny_maskrcnn):
    """compute_losses with cum_samples returns (losses, cum) — the
    make_train_step contract."""
    import jax.numpy as jnp2

    model, params = tiny_maskrcnn
    img = jnp.asarray(np.random.RandomState(6).randn(1, 64, 64, 3).astype(np.float32))
    batch = _tiny_batch(b=1)
    cum = jnp2.zeros((3, 4))
    losses, cum_out = jax.jit(
        lambda p, x, b, c: model.apply(
            p, x, b, c, method="compute_losses",
            rngs={"sampling": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(70)},
        )
    )(params, img, batch, cum)
    assert np.isfinite(float(losses["total"]))
    np.testing.assert_array_equal(np.asarray(cum_out), np.asarray(cum))


def test_nuhtc_fuse_train_seg_branch_losses():
    """lite_fuse training adds loss_binary_seg (reference _Lite_Fuse
    forward_train, htc_roi_head_cus.py:3010-3012, trains ONLY that term);
    fuse_aux_losses=True additionally enables the beyond-reference dist/cls
    objectives. With gt_ismask the unannotated-instance pixels are masked out
    (loss_partial), so the value must differ from the all-annotated run."""
    model = NuHTC(
        num_classes=3,
        fpn_channels=32,
        backbone_cfg=TINY_BACKBONE,
        lite_fuse=True,
        fuse_aux_losses=True,
        fuse_max_instances=16,
        rpn_nms_pre=128,
        rpn_max_per_img=64,
        watershed_max=32,
        nms_candidates=128,
        scale_factor=2.0,
    )
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0, method="init_forward")
    rng = np.random.RandomState(9)
    batch = _tiny_batch(b=1, rng=rng)
    batch["gt_labels"] = jnp.asarray(rng.randint(0, 3, (1, 8)), dtype=jnp.int32)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    def run(b):
        losses, _ = model.apply(
            params, img, b, jnp.zeros((3, 3), jnp.float32),
            method="compute_losses",
            rngs={"sampling": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(50)},
        )
        return losses

    losses = run(batch)
    assert np.isfinite(float(losses["loss_binary_seg"]))
    assert np.isfinite(float(losses["loss_dist"]))
    assert np.isfinite(float(losses["loss_global_cls"]))

    full = dict(batch)
    full.pop("gt_ismask")
    losses_full = run(full)
    assert float(losses_full["loss_binary_seg"]) != float(losses["loss_binary_seg"])
