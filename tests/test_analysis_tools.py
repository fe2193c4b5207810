"""Unit tests for the analysis-tool helpers (robustness aggregation,
per-image mAP ranking, viz panels)."""

import importlib.util
import os
import sys

import numpy as np

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_robustness_summary():
    re_mod = _load("robustness_eval")
    results = {
        "noise": {0: {"pq": 0.6, "dice": 0.8}, 1: {"pq": 0.5, "dice": 0.7},
                  3: {"pq": 0.3, "dice": 0.5}},
        "blur": {0: {"pq": 0.6, "dice": 0.8}, 1: {"pq": 0.4, "dice": 0.6},
                 3: {"pq": 0.2, "dice": 0.4}},
    }
    metrics, p, mpc, rpc = re_mod.robustness_summary(results, ["pq", "dice"])
    np.testing.assert_allclose(p, [0.6, 0.8])
    np.testing.assert_allclose(mpc, [(0.5 + 0.3 + 0.4 + 0.2) / 4, (0.7 + 0.5 + 0.6 + 0.4) / 4])
    np.testing.assert_allclose(rpc, mpc / p)


def test_per_image_map_perfect_and_empty():
    ar = _load("analyze_results")
    gt = np.array([[10, 10, 30, 30], [50, 50, 70, 80]], np.float32)
    labels = np.array([0, 1])
    # perfect detections → mAP 1.0 (101-pt interpolation is exact here)
    dets = [np.array([[10, 10, 30, 30, 0.9]]), np.array([[50, 50, 70, 80, 0.8]])]
    assert ar.per_image_map(dets, gt, labels) > 0.99
    # no detections → 0
    dets0 = [np.zeros((0, 5), np.float32)] * 2
    assert ar.per_image_map(dets0, gt, labels) == 0.0
    # shifted detections → between
    dets_bad = [np.array([[14, 14, 34, 34, 0.9]]), np.array([[50, 50, 70, 80, 0.8]])]
    v = ar.per_image_map(dets_bad, gt, labels)
    assert 0.2 < v < 1.0


def test_viz_panel_shapes():
    vz = _load("viz_utils")
    img = np.full((32, 40, 3), 200, np.uint8)
    m1 = np.zeros((32, 40), bool); m1[5:15, 5:15] = True
    panel = vz.imshow_gt_det(img, [m1], [0], [m1], [1], [0.9])
    assert panel.shape == (32, 84, 3)
    inst = np.zeros((32, 40), np.int32); inst[20:30, 20:30] = 3
    over = vz.overlay_instances(img, inst)
    assert over.shape == img.shape


def test_convert_format_roundtrip():
    spec_dir = os.path.join(os.path.dirname(__file__), "..", "tools", "dataset")
    spec = importlib.util.spec_from_file_location(
        "convert_format", os.path.join(spec_dir, "convert_format.py")
    )
    cf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cf)

    rng = np.random.RandomState(0)
    n, h, w = 2, 32, 32
    conic = np.zeros((n, h, w, 2), np.int32)
    uid = 1
    for i in range(n):
        for _ in range(5):
            y, x = rng.randint(0, h - 6), rng.randint(0, w - 6)
            if conic[i, y : y + 5, x : x + 5, 0].any():
                continue
            conic[i, y : y + 5, x : x + 5, 0] = uid
            conic[i, y : y + 5, x : x + 5, 1] = rng.randint(1, 4)
            uid += 1

    pann = cf.conic2pannuke(conic)
    assert pann.shape[-1] == int(conic[..., 1].max()) + 1
    # background flag correct
    np.testing.assert_array_equal(pann[..., -1] == 1, conic[..., 0] == 0)
    back = cf.pannuke2conic(pann)
    # class maps must agree; instance ids are renumbered but partition-equal
    np.testing.assert_array_equal(back[..., 1], conic[..., 1])
    for i in range(n):
        for u in np.unique(conic[i, :, :, 0]):
            if u == 0:
                continue
            ids = np.unique(back[i, :, :, 0][conic[i, :, :, 0] == u])
            assert len(ids) == 1 and ids[0] != 0
