"""WSI pipeline tests (host-side; no model/jax needed)."""

import json
import os

import cv2
import numpy as np
import pytest

from nuhtc_tpu.wsi.slide import ImageReader, open_slide
from nuhtc_tpu.wsi.tissue import segment_tissue, grid_coords, save_coords_h5, load_coords_h5
from nuhtc_tpu.wsi.stitch import stitch_coords
from nuhtc_tpu.wsi.merge import merge_features, raster_iou, poly_area
from nuhtc_tpu.wsi.features import nucleus_features, color_deconvolution


@pytest.fixture(scope="module")
def fake_slide(tmp_path_factory):
    """White background + a pink tissue blob."""
    d = tmp_path_factory.mktemp("wsi")
    img = np.full((1024, 1536, 3), 245, np.uint8)
    cv2.circle(img, (700, 500), 380, (200, 120, 160), -1)  # "tissue" (RGB-ish)
    path = str(d / "slide.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return path


def test_image_reader(fake_slide):
    s = open_slide(fake_slide)
    assert isinstance(s, ImageReader)
    assert s.dimensions == (1536, 1024)
    r = s.read_region((100, 200), 0, (64, 32))
    assert r.shape == (32, 64, 3)
    # out-of-bounds read pads with zeros
    r2 = s.read_region((1500, 1000), 0, (64, 64))
    assert r2.shape == (64, 64, 3) and r2[40:, 40:].sum() == 0


def test_tissue_seg_and_grid(fake_slide, tmp_path):
    s = open_slide(fake_slide)
    seg = segment_tissue(s)
    assert len(seg.contours) >= 1
    coords = grid_coords(s, seg, patch_size=256, step_size=192)
    assert len(coords) > 0
    # all coords centers near the blob
    centers = coords + 128
    d = np.linalg.norm(centers - np.array([700, 500]), axis=1)
    assert (d < 600).all()
    h5 = str(tmp_path / "c.h5")
    save_coords_h5(h5, coords, dict(patch_size=256))
    back, attrs = load_coords_h5(h5)
    np.testing.assert_array_equal(coords, back)
    assert attrs["patch_size"] == 256


def test_stitch(fake_slide):
    s = open_slide(fake_slide)
    seg = segment_tissue(s)
    coords = grid_coords(s, seg, 256, 192)
    mosaic = stitch_coords(s, coords, 256, downscale=64)
    assert mosaic.shape == (16, 24, 3)
    assert mosaic.sum() > 0


def _circle_feature(cx, cy, r, score, label=0, n=32):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], 1)
    ring = np.concatenate([ring, ring[:1]])
    return {
        "type": "Feature",
        "geometry": {"type": "Polygon", "coordinates": [ring.tolist()]},
        "properties": {"label": label, "score": score},
    }


def test_merge_probability_keeps_highest_score():
    feats = [
        _circle_feature(50, 50, 10, 0.9),
        _circle_feature(52, 50, 10, 0.8),  # overlaps 1st
        _circle_feature(150, 150, 10, 0.7),
    ]
    merged = merge_features(feats, overlap_threshold=0.05, merge_strategy="probability")
    assert len(merged) == 2
    scores = sorted(f["properties"]["score"] for f in merged)
    assert scores == [0.7, 0.9]


def test_merge_area_keeps_largest():
    feats = [
        _circle_feature(50, 50, 8, 0.9),
        _circle_feature(50, 50, 14, 0.5),  # bigger, lower score
    ]
    merged = merge_features(feats, 0.05, "area")
    assert len(merged) == 1
    assert merged[0]["properties"]["score"] == 0.5


def test_raster_iou_sanity():
    sq1 = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    sq2 = sq1 + [5, 0]
    iou = raster_iou(sq1, sq2)
    assert 0.25 < iou < 0.45  # ~1/3 with pixel quantization
    assert raster_iou(sq1, sq1 + [100, 100]) == 0.0
    assert poly_area(sq1) == 100.0


def test_nucleus_features():
    rgb = np.full((40, 40, 3), 180, np.uint8)
    mask = np.zeros((40, 40), np.uint8)
    cv2.circle(mask, (20, 20), 10, 1, -1)
    f = nucleus_features(rgb, mask, offset=(100, 200))
    assert f is not None
    assert abs(f["centroid_x"] - 120) < 1.5 and abs(f["centroid_y"] - 220) < 1.5
    assert 250 < f["area"] < 340
    assert f["circularity"] > 0.8
    assert f["eccentricity"] < 0.4
    assert "hematoxylin_mean" in f and "haralick_energy" in f
    assert f["solidity"] > 0.9


def test_color_deconvolution_shapes():
    rgb = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    c = color_deconvolution(rgb)
    assert c.shape == (16, 16, 3)
    assert np.isfinite(c).all()


def test_nucleus_features_extended_columns():
    """Gradient/FSD/Hu/extended-Haralick blocks (histomicstk column parity,
    reference README.md:281-287): ~140 finite columns incl. the new blocks."""
    rng = np.random.RandomState(3)
    rgb = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    mask = np.zeros((48, 48), np.uint8)
    cv2.ellipse(mask, (24, 24), (14, 9), 30, 0, 360, 1, -1)
    f = nucleus_features(rgb, mask)
    assert f is not None
    assert len(f) >= 130
    assert all(np.isfinite(v) for v in f.values())
    # block presence
    for key in ("fsd1", "fsd6", "hu_moment1", "hu_moment7",
                "weighted_hu_moment1", "weighted_centroid_x",
                "grad_mag_mean", "grad_canny_mean", "fractal_dimension",
                "haralick_imc2", "haralick_sum_entropy_range",
                "hematoxylin_skewness", "r_iqr", "convex_hull_area"):
        assert key in f, key
    # FSD energies are a normalized spectrum; smooth ellipse → low-freq heavy
    s = sum(f[f"fsd{i}"] for i in range(1, 7))
    assert 0.9 < s <= 1.0 + 1e-6
    assert f["fsd1"] > 0.5
    # circle-ish ellipse: fractal dimension of a smooth boundary ≈ 1
    assert 0.7 < f["fractal_dimension"] < 1.6


def test_merge_geojson_uniform_classification(tmp_path):
    from nuhtc_tpu.wsi.merge import merge_geojson_file

    feats = [
        _circle_feature(50, 50, 10, 0.9),
        _circle_feature(52, 50, 10, 0.8),
        _circle_feature(150, 150, 10, 0.7, label=2),
    ]
    src = tmp_path / "s.geojson"
    with open(src, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    out = merge_geojson_file(str(src), 0.05, "probability",
                             str(tmp_path / "u.geojson"),
                             uniform_classification=True)
    with open(out) as f:
        merged = json.load(f)["features"]
    assert len(merged) == 2
    for i, feat in enumerate(merged):
        props = feat["properties"]
        assert props["nuclei_id"] == i  # reference nuclei_merge.py:201
        assert props["classification"]["name"] == "uniform"
        assert props["classification"]["color"] == [255, 255, 0]


def test_feat_extract_threaded_matches_serial(fake_slide, tmp_path):
    """tools/wsi_feat_extract --num_workers N must be value-identical to the
    serial path (reference DataLoader analog)."""
    import pandas as pd

    import tools.wsi_feat_extract as fx

    feats = [
        _circle_feature(700, 500, 30, 0.9, label=1),
        _circle_feature(600, 450, 22, 0.8, label=0),
        _circle_feature(800, 560, 26, 0.7, label=2),
    ]
    gj = tmp_path / "s.geojson"
    with open(gj, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    csv1 = str(tmp_path / "serial.csv")
    csv2 = str(tmp_path / "threaded.csv")
    n1 = fx.extract_slide_features(fake_slide, str(gj), csv1, num_workers=1)
    n2 = fx.extract_slide_features(fake_slide, str(gj), csv2, num_workers=4, bs_size=2)
    assert n1 == n2 == 3
    d1, d2 = pd.read_csv(csv1), pd.read_csv(csv2)
    pd.testing.assert_frame_equal(d1, d2)
