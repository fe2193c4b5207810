import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nuhtc_tpu.models.detector import NuHTC


@pytest.fixture(scope="module")
def tiny_detector():
    model = NuHTC(
        num_classes=5,
        fpn_channels=32,
        backbone_cfg=dict(
            embed_dims=32,
            depths=(1, 1, 1, 1),
            num_heads=(1, 2, 4, 8),
            window_size=7,
        ),
        rpn_nms_pre=256,
        rpn_max_per_img=64,
        rpn_min_bbox_size=0.0,
        rcnn_max_per_img=32,
        watershed_max=32,
        nms_candidates=256,
        scale_factor=2.0,
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    return model, params


def test_detector_forward_shapes(tiny_detector):
    model, params = tiny_detector
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    out = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    assert out["boxes"].shape == (2, 32, 4)
    assert out["scores"].shape == (2, 32)
    assert out["labels"].shape == (2, 32)
    assert out["probs"].shape == (2, 32, 5)
    assert out["mask_probs"].shape == (2, 32, 28, 28)
    assert out["valid"].shape == (2, 32)
    # boxes are in the original (rescaled-down) frame: <= 32
    assert float(jnp.max(out["boxes"])) <= 32.0 + 1e-3
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and (mp >= 0).all() and (mp <= 1).all()


def test_detector_batch_consistency(tiny_detector):
    """Same image alone vs in a batch must give identical detections."""
    model, params = tiny_detector
    rng = np.random.RandomState(1)
    img1 = rng.randn(1, 64, 64, 3).astype(np.float32)
    img2 = rng.randn(1, 64, 64, 3).astype(np.float32)
    f = jax.jit(lambda p, x: model.apply(p, x))
    out_single = f(params, jnp.asarray(img1))
    out_batch = f(params, jnp.asarray(np.concatenate([img1, img2])))
    for k in ("boxes", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(out_single[k][0]), np.asarray(out_batch[k][0]), rtol=1e-4, atol=1e-4
        )


def test_detector_cus_full_cascade_mask():
    """lite=False = the full _Cus RoI-head variant (reference
    htc_roi_head_cus.py:22-830): a mask head per cascade stage with
    info-flow, trained at every stage and sigmoid-averaged at test."""
    model = NuHTC(
        num_classes=5,
        fpn_channels=32,
        backbone_cfg=dict(
            embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=7
        ),
        rpn_nms_pre=256,
        rpn_max_per_img=64,
        rpn_min_bbox_size=0.0,
        rcnn_max_per_img=16,
        watershed_max=32,
        nms_candidates=256,
        scale_factor=2.0,
        lite=False,
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
    # one conv_res-bearing mask head per later stage
    heads = params["params"]
    assert "mask_heads_0" in heads and "mask_heads_2" in heads
    assert "conv_res" not in heads["mask_heads_0"]
    assert "conv_res" in heads["mask_heads_1"]

    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))
    out = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert out["mask_probs"].shape == (1, 16, 28, 28)
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and (mp >= 0).all() and (mp <= 1).all()

    rng = np.random.RandomState(2)
    g = 8
    cx = rng.uniform(8, 56, (1, g)); cy = rng.uniform(8, 56, (1, g))
    half = rng.uniform(3, 6, (1, g))
    batch = dict(
        gt_boxes=jnp.asarray(
            np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32)
        ),
        gt_labels=jnp.asarray(rng.randint(0, 5, (1, g)), dtype=jnp.int32),
        gt_valid=jnp.asarray(np.ones((1, g), bool)),
        gt_patches=jnp.asarray(np.ones((1, g, 64, 64), np.float32)),
        gt_semantic=jnp.asarray(rng.randint(0, 2, (1, 16, 16)), dtype=jnp.int32),
    )
    losses, cum = model.apply(
        params, x, batch, jnp.zeros((3, 5), jnp.float32),
        method="compute_losses",
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(30)},
    )
    # mask loss present at EVERY stage (the _Cus signature)
    for s in range(3):
        assert f"s{s}.loss_mask" in losses, sorted(losses)
        assert np.isfinite(float(losses[f"s{s}.loss_mask"]))
    assert np.isfinite(float(losses["total"]))


def test_build_detector_sampler_mapping():
    """train_cfg.rcnn[*].sampler.type flows through build_detector."""
    from nuhtc_tpu.models.build import build_detector

    base = dict(
        type="NuHTC",
        roi_head=dict(type="HybridTaskCascadeRoIHead_Lite"),
        train_cfg=dict(rcnn=[dict(sampler=dict(type="OHEMSampler_HTC"))]),
    )
    assert build_detector(base).rcnn_sampler == "ohem"
    base["train_cfg"] = dict(
        rcnn=dict(sampler=dict(type="InstanceBalancedPosSampler_Cus"))
    )
    assert build_detector(base).rcnn_sampler == "instance_balanced"
    base["train_cfg"] = dict(rcnn=[dict(sampler=dict(type="RandomSampler"))])
    assert build_detector(base).rcnn_sampler == "random"
    # roi_head family dispatch
    assert build_detector(dict(type="NuHTC", roi_head=dict(type="HybridTaskCascadeRoIHead_Cus"))).lite is False
    assert build_detector(dict(type="NuHTC", roi_head=dict(type="HybridTaskCascadeRoIHead_Lite_Fuse"))).lite_fuse is True


def test_detector_ohem_sampler_losses(tiny_detector):
    """rcnn_sampler='ohem' runs end-to-end: pool → head forward → hardest
    selection → finite stage losses (OHEMSampler_HTC analog)."""
    model, params = tiny_detector
    ohem_model = model.clone(rcnn_sampler="ohem")
    rng = np.random.RandomState(4)
    g = 8
    cx = rng.uniform(8, 56, (1, g)); cy = rng.uniform(8, 56, (1, g))
    half = rng.uniform(3, 6, (1, g))
    batch = dict(
        gt_boxes=jnp.asarray(
            np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32)
        ),
        gt_labels=jnp.asarray(rng.randint(0, 5, (1, g)), dtype=jnp.int32),
        gt_valid=jnp.asarray(np.ones((1, g), bool)),
        gt_patches=jnp.asarray(np.ones((1, g, 64, 64), np.float32)),
        gt_semantic=jnp.asarray(rng.randint(0, 2, (1, 16, 16)), dtype=jnp.int32),
    )
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    losses, _ = ohem_model.apply(
        params, x, batch, jnp.zeros((3, 5), jnp.float32),
        method="compute_losses",
        rngs={"sampling": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(70)},
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_train_banded_matches_dense():
    """Banded train-step extraction (sorted rois -> banded scan -> unsorted
    head outputs) == dense train extraction when the repair budget covers
    every overflow. Same sampling keys => identical samples, so all loss
    terms must agree up to bf16 reassociation."""
    rng = np.random.RandomState(4)

    def build(band):
        return NuHTC(
            num_classes=5, fpn_channels=32,
            backbone_cfg=dict(
                embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                window_size=7,
            ),
            rpn_nms_pre=256, rpn_max_per_img=64, rpn_min_bbox_size=0.0,
            rcnn_max_per_img=16, watershed_max=32, nms_candidates=256,
            scale_factor=2.0,
            train_roi_band=band, train_roi_overflow=4096, roi_chunk=8,
        )

    m_dense = build(0)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = m_dense.init(jax.random.PRNGKey(0), img)

    g = 6
    x1 = rng.uniform(0, 50, (1, g)); y1 = rng.uniform(0, 50, (1, g))
    gtb = np.stack([x1, y1, x1 + rng.uniform(4, 14, (1, g)),
                    y1 + rng.uniform(4, 14, (1, g))], -1).astype(np.float32)
    batch = dict(
        gt_boxes=jnp.asarray(gtb),
        gt_labels=jnp.asarray(rng.randint(0, 5, (1, g)), dtype=jnp.int32),
        gt_valid=jnp.ones((1, g), bool),
        gt_patches=jnp.asarray(np.ones((1, g, 64, 64), np.float32)),
        gt_semantic=jnp.asarray(rng.randint(0, 2, (1, 16, 16)), dtype=jnp.int32),
    )
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    kw = dict(
        method="compute_losses",
        rngs={"sampling": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(50)},
    )
    ld, _ = m_dense.apply(params, x, batch, jnp.zeros((3, 5), jnp.float32), **kw)
    lb, _ = build(64).apply(params, x, batch, jnp.zeros((3, 5), jnp.float32), **kw)
    assert sorted(ld) == sorted(lb)
    for k in ld:
        np.testing.assert_allclose(
            float(ld[k]), float(lb[k]), rtol=2e-2, atol=2e-3, err_msg=k
        )
