"""x-banded RoIAlign vs the dense path (ops/roi_align.py banded mode).

The banded path must equal the dense separable-matmul path (itself oracle-
tested in test_ops_roi_align.py) whenever every overflowing roi fits in the
replacement slots — by construction exactly when overflow_slots == R, and in
practice for x-sorted nuclei-sized rois with a handful of slots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuhtc_tpu.ops.roi_align import roi_align


def _random_rois(rng, n, size, max_wh, min_wh=2.0):
    x1 = rng.uniform(0, size - min_wh, n)
    y1 = rng.uniform(0, size - min_wh, n)
    w = rng.uniform(min_wh, max_wh, n)
    h = rng.uniform(min_wh, max_wh, n)
    x2 = np.minimum(x1 + w, size)
    y2 = np.minimum(y1 + h, size)
    return np.stack([x1, y1, x2, y2], -1).astype(np.float32)


@pytest.mark.parametrize("sampling_ratio,pool_from", [(2, None), (0, None), (0, 14)])
def test_banded_matches_dense_sorted_small_rois(sampling_ratio, pool_from):
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(64, 64, 32).astype(np.float32))
    rois = _random_rois(rng, 96, 256, max_wh=100.0)  # ≤ 25 feature cols at /4
    rois = rois[np.argsort(rois[:, 0] + rois[:, 2])]
    rois = jnp.asarray(rois)

    kw = dict(
        spatial_scale=0.25, output_size=7, sampling_ratio=sampling_ratio,
        pool_from=pool_from, chunk=16,
    )
    dense = roi_align(feat, rois, **kw)
    banded = roi_align(feat, rois, band=32, overflow_slots=32, **kw)
    np.testing.assert_allclose(
        np.asarray(banded), np.asarray(dense), rtol=0, atol=2e-2
    )  # bf16 path; identical products, different accumulation order


def test_banded_exact_with_full_slots_unsorted_wide():
    """overflow_slots == R ⇒ banded equals dense for ANY input (unsorted,
    wide rois, degenerate boxes) — every overflowing roi is repaired."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(64, 64, 32).astype(np.float32))
    rois = np.concatenate([
        _random_rois(rng, 40, 256, max_wh=250.0),   # wide, spans most of W
        _random_rois(rng, 40, 256, max_wh=30.0),
        np.zeros((8, 4), np.float32),               # padding rois
    ])
    rng.shuffle(rois)  # deliberately unsorted
    rois = jnp.asarray(rois)

    kw = dict(spatial_scale=0.25, output_size=7, sampling_ratio=0, chunk=16)
    dense = roi_align(feat, rois, **kw)
    banded = roi_align(feat, rois, band=32, overflow_slots=rois.shape[0], **kw)
    np.testing.assert_allclose(
        np.asarray(banded), np.asarray(dense), rtol=0, atol=2e-2
    )


def test_banded_f32_bitwise_inband():
    """With exact=False but f32 feat, in-band rois see the same hat weights
    and the same nonzero products — tight agreement."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(32, 128, 8).astype(np.float32))
    # all rois in a narrow x-strip so every chunk window covers them
    rois = _random_rois(rng, 48, 128, max_wh=40.0)
    rois[:, 0] = rng.uniform(40, 60, 48)
    rois[:, 2] = rois[:, 0] + rng.uniform(4, 30, 48)
    rois = rois[np.argsort(rois[:, 0] + rois[:, 2])]
    rois = jnp.asarray(rois)

    kw = dict(spatial_scale=1.0, output_size=7, sampling_ratio=2, chunk=16)
    dense = roi_align(feat, rois, **kw)
    banded = roi_align(feat, rois, band=64, overflow_slots=0, **kw)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense), atol=2e-2)


def test_detector_banded_matches_dense():
    """Full detector: banded inference == dense inference on a tiny config
    (generous overflow slots make the banded path exact)."""
    from nuhtc_tpu.models.detector import NuHTC

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))

    def build(roi_band):
        return NuHTC(
            num_classes=3, rpn_nms_pre=256, rpn_max_per_img=64,
            watershed_max=32, rcnn_max_per_img=32, nms_candidates=256,
            roi_band=roi_band, roi_overflow=96, scale_factor=1.0,
        )

    m_dense = build(0)
    params = m_dense.init(jax.random.PRNGKey(0), img, method="init_forward")
    out_d = m_dense.apply(params, img)
    out_b = build(32).apply(params, img)

    # same detections: compare where both are valid
    np.testing.assert_array_equal(np.asarray(out_b["valid"]), np.asarray(out_d["valid"]))
    v = np.asarray(out_d["valid"]).astype(bool)
    for k, atol in (("boxes", 1e-2), ("scores", 1e-3), ("mask_probs", 2e-2)):
        a, b = np.asarray(out_d[k])[v], np.asarray(out_b[k])[v]
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(out_d["labels"])[v], np.asarray(out_b["labels"])[v]
    )


def _stage_inputs(rng, n_rois, max_wh=40.0, img=256):
    feats = tuple(
        jnp.asarray(rng.randn(img // s, img // s, 16).astype(np.float32))
        for s in (4, 8, 16, 32)
    )
    sem = jnp.asarray(rng.randn(img // 4, img // 4, 16).astype(np.float32))
    rois = _random_rois(rng, n_rois, img, max_wh=max_wh)
    return feats, sem, rois


def _dense_stage(feats, sem, rois, out, sr, sem_pool_from=None):
    from nuhtc_tpu.models.roi_extractor import (
        attention_roi_features, single_roi_features,
    )

    rf = attention_roi_features(feats, rois, out, sr)
    sem_rf = single_roi_features(
        sem, rois, out, stride=4,
        sampling_ratio=0 if sem_pool_from else sr, pool_from=sem_pool_from,
    )
    r = rois.shape[0]
    return (rf + sem_rf).reshape(r, -1)


@pytest.mark.parametrize("yband", [None, 32])
def test_banded_stage_full_slots_exact_any_input(yband):
    """banded_stage_features with overflow_slots == R equals the dense
    attention+semantic sum for ANY roi set (unsorted, wide) — x-only and 2-d
    banding both repair every overflowing roi."""
    from nuhtc_tpu.models.roi_extractor import banded_stage_features

    rng = np.random.RandomState(7)
    feats, sem, rois_np = _stage_inputs(rng, 64, max_wh=150.0)
    rng.shuffle(rois_np)  # deliberately unsorted
    rois = jnp.asarray(rois_np)

    dense = _dense_stage(feats, sem, rois, 7, 2, sem_pool_from=14)
    banded = banded_stage_features(
        feats, sem, rois, 7, 2, band=32, yband=yband,
        overflow_slots=rois.shape[0], sem_pool_from=14,
    )
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense), atol=2e-2)


def test_banded_stage_yband_sorted_small_rois():
    """(y-stripe, x)-sorted nuclei-sized rois: 2-d banding matches dense with
    a repair budget sized for stripe-straddling chunks (rois of a chunk that
    spans a stripe boundary can exceed the shared y-window and fall back to
    the exact dense repair — roughly half a chunk per straddle)."""
    from nuhtc_tpu.models.roi_extractor import banded_stage_features

    rng = np.random.RandomState(8)
    feats, sem, rois_np = _stage_inputs(rng, 96, max_wh=40.0)
    stripe = 48 * 4 * 2 / 3  # detector._band_sort_key convention
    yq = np.floor((rois_np[:, 1] + rois_np[:, 3]) * (0.5 / stripe))
    key = yq * 8192.0 + rois_np[:, 0] + rois_np[:, 2]
    rois = jnp.asarray(rois_np[np.argsort(key)])

    dense = _dense_stage(feats, sem, rois, 14, 0)
    banded = banded_stage_features(
        feats, sem, rois, 14, 0, band=32, yband=48, overflow_slots=48,
    )
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense), atol=2e-2)


def test_banded_stage_fc0_fold_matches_post_matmul():
    """fc0_kernel folding == (features then matmul), incl. repaired rois."""
    from nuhtc_tpu.models.roi_extractor import banded_stage_features

    rng = np.random.RandomState(9)
    feats, sem, rois_np = _stage_inputs(rng, 64, max_wh=120.0)
    rng.shuffle(rois_np)
    rois = jnp.asarray(rois_np)
    w0 = jnp.asarray(rng.randn(7 * 7 * 16, 64).astype(np.float32) * 0.05)

    kw = dict(band=32, yband=32, overflow_slots=rois.shape[0], sem_pool_from=14)
    feats_flat = banded_stage_features(feats, sem, rois, 7, 2, **kw)
    ref = jnp.dot(
        feats_flat.astype(jnp.bfloat16), w0.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    fused = banded_stage_features(feats, sem, rois, 7, 2, fc0_kernel=w0, **kw)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=5e-2, rtol=1e-2
    )


def test_banded_stage_conv0_fold_matches_post_conv():
    """conv0_kernel folding == (features then SAME 3x3 conv), incl. repaired
    rois (linear, like the fc0 fold)."""
    import jax
    from nuhtc_tpu.models.roi_extractor import banded_stage_features, conv3x3_same

    rng = np.random.RandomState(10)
    feats, sem, rois_np = _stage_inputs(rng, 64, max_wh=120.0)
    rng.shuffle(rois_np)
    rois = jnp.asarray(rois_np)
    w0 = jnp.asarray(rng.randn(3, 3, 16, 24).astype(np.float32) * 0.1)

    kw = dict(band=32, overflow_slots=rois.shape[0])
    feats_flat = banded_stage_features(feats, sem, rois, 14, 0, **kw)
    ref = conv3x3_same(feats_flat.reshape(-1, 14, 14, 16), w0)
    fused = banded_stage_features(feats, sem, rois, 14, 0, conv0_kernel=w0, **kw)
    np.testing.assert_allclose(
        np.asarray(fused).reshape(ref.shape), np.asarray(ref),
        atol=5e-2, rtol=1e-2,
    )


def test_conv3x3_same_matches_lax_conv():
    """The unfold-matmul conv == lax.conv_general_dilated SAME."""
    import jax
    from nuhtc_tpu.models.roi_extractor import conv3x3_same

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(4, 14, 14, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 12).astype(np.float32))
    got = conv3x3_same(x, w, cdtype=jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
