"""Tests for the round-3 tool ports: pannuke/compute_stats_all,
print_metric, conic/misc/patch_extractor, optimize_anchors
(VERDICT.md round 2, "What's missing" items 1-5)."""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(TOOLS, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def _make_pannuke(n=2, size=64, num_classes=5):
    """Tiny (n, size, size, 6) per-class instance arrays + matching preds."""
    true = np.zeros((n, size, size, num_classes + 1), np.int32)
    pred = np.zeros_like(true)
    # img0: class 0 has two GT nuclei; pred hits one, misses one, adds a FP
    true[0, :, :, 0][_disk(size, size, 16, 16, 6)] = 1
    true[0, :, :, 0][_disk(size, size, 48, 48, 6)] = 2
    pred[0, :, :, 0][_disk(size, size, 17, 15, 6)] = 1  # centroid within 12px
    pred[0, :, :, 0][_disk(size, size, 48, 16, 6)] = 2  # unmatched FP
    # img1: class 1 one nucleus, predicted exactly
    true[1, :, :, 1][_disk(size, size, 32, 32, 8)] = 1
    pred[1, :, :, 1][_disk(size, size, 32, 32, 8)] = 1
    return true, pred


def test_compute_stats_all_coord(tmp_path):
    mod = _load(os.path.join("pannuke", "compute_stats_all.py"), "compute_stats_all")
    true, pred = _make_pannuke()
    types = ["Breast", "Colon"]
    out = mod.run(true, pred, types, str(tmp_path), mode="coord")

    # img0 class0: tp=1 fp=1 fn=1 -> dq = 1/(1+.5+.5) = 0.5 (ref get_coord_pq)
    dq_rows = out["DQ"]
    # class_stats: per-class nanmean over images — class0 only img0 counts
    assert np.isclose(
        float(np.nanmean([0.5])), 0.5
    )
    # tissue table: Breast = img0 (mDQ = nanmean over classes = 0.5),
    # Colon = img1 (class1 perfect -> dq 1.0)
    t = dq_rows
    breast = t["DQ"][t["Tissue name"].index("Breast")]
    colon = t["DQ"][t["Tissue name"].index("Colon")]
    assert np.isclose(breast, 0.5) and np.isclose(colon, 1.0)
    # det counts are summed, not averaged
    assert out["TP"]["TP"][-1] == 2.0  # binary: 1 (img0) + 1 (img1)
    assert out["FP"]["FP"][-1] == 1.0
    assert out["FN"]["FN"][-1] == 1.0
    for metric in ["DQ", "Precision", "Recall"]:
        assert (tmp_path / f"class_stats_{metric}.csv").exists()
        assert (tmp_path / f"tissue_stats_{metric}.csv").exists()
    for metric in ["TP", "FP", "FN"]:
        assert (tmp_path / f"class_stats_{metric}.csv").exists()


def test_compute_stats_all_iou_matches_fast_pq(tmp_path):
    mod = _load(os.path.join("pannuke", "compute_stats_all.py"), "compute_stats_all2")
    from nuhtc_tpu.eval.stats import get_fast_pq, remap_label

    true, pred = _make_pannuke()
    out = mod.run(true, pred, ["Breast", "Colon"], str(tmp_path), mode="iou")
    # binary PQ of img1 from the tool == direct get_fast_pq
    [_, _, pq_ref], _ = get_fast_pq(
        remap_label(true[1, :, :, 1]), remap_label(pred[1, :, :, 1])
    )
    t = out["PQ"]
    assert np.isclose(t["PQ bin"][t["Tissue name"].index("Colon")], pq_ref)


def test_compute_stats_all_empty_gt_nan(tmp_path):
    """Empty-GT image: NaN rates (excluded from nanmean), zero counts."""
    mod = _load(os.path.join("pannuke", "compute_stats_all.py"), "compute_stats_all3")
    true, pred = _make_pannuke()
    true[1] = 0  # img1 GT emptied; pred still has an instance
    out = mod.run(true, pred, ["Breast", "Colon"], str(tmp_path), mode="coord")
    t = out["DQ"]
    assert math.isnan(t["DQ bin"][t["Tissue name"].index("Colon")])
    # binary FP count for the empty image is 0 per ref :201-203
    assert out["FP"]["FP"][-1] == 1.0  # img0's single binary FP only


def test_print_metric(tmp_path):
    pd = pytest.importorskip("pandas")
    mod = _load("print_metric.py", "print_metric_tool")
    tissues = [f"T{i}" for i in range(19)] + ["mean"]
    for fold in (1, 2, 3):
        d = tmp_path / f"exp{fold}"
        d.mkdir()
        pq = np.linspace(0.3, 0.6, 20) + 0.01 * fold
        pd.DataFrame({"Tissue name": tissues, "PQ": pq, "PQ bin": pq + 0.1}).to_csv(
            d / "tissue_stats.csv"
        )
        pd.DataFrame(
            {"Class Name": ["A", "B"], "PQ": [0.4 + 0.01 * fold, 0.5]}
        ).to_csv(d / "class_stats.csv")

    res = mod.print_single(str(tmp_path / "exp1"))
    assert np.isclose(res["mPQ"], 0.61) and np.isclose(res["PQ"], 0.71)
    got = pd.read_csv(tmp_path / "exp1" / "format_stats.csv", index_col=0)
    assert np.isclose(got["PQ"][0], 0.71) and np.isclose(got["mPQ"][0], 0.61)
    mod.print_folds(str(tmp_path), "exp")  # 3-fold aggregate runs clean


def test_patch_extractor_counts_and_content():
    mod = _load(os.path.join("conic", "misc", "patch_extractor.py"), "patch_extractor")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 90, 3), np.uint8)
    ex = mod.PatchExtractor(32, 24)

    patches = ex.extract(img, "valid")
    # inline reference count: valid grid + bottom row + right col + corner
    def n_steps(length, win, step):
        flag = (length - win) % step != 0
        return math.floor((length - win) / step) + 1, flag
    nh, hf = n_steps(120, 32, 24)
    nw, wf = n_steps(90, 32, 24)
    expect = nh * nw + (nw if hf else 0) + (nh if wf else 0) + (1 if hf and wf else 0)
    assert len(patches) == expect
    assert all(p.shape == (32, 32, 3) for p in patches)
    np.testing.assert_array_equal(patches[0], img[:32, :32])

    # mirror mode: centers tile the original exactly when dims % step == 0
    img2 = rng.randint(0, 255, (96, 72, 3), np.uint8)
    mp = ex.extract(img2, "mirror")
    rows, cols = 96 // 24, 72 // 24
    recon = np.zeros_like(img2)
    for i in range(rows):
        for j in range(cols):
            c = mod.cropping_center(mp[i * cols + j], (24, 24))
            recon[i * 24:(i + 1) * 24, j * 24:(j + 1) * 24] = c
    np.testing.assert_array_equal(recon, img2)

    # undersized input pads up to a single window
    small = ex.extract(rng.randint(0, 255, (20, 20, 3), np.uint8), "valid")
    assert len(small) == 1 and small[0].shape == (32, 32, 3)


def test_optimize_anchors_kmeans_and_de(tmp_path):
    mod = _load("optimize_anchors.py", "optimize_anchors_tool")
    rng = np.random.RandomState(0)
    whs = np.concatenate([
        rng.normal([12, 12], 1.0, (200, 2)),
        rng.normal([40, 20], 2.0, (200, 2)),
    ]).clip(min=2)

    anchors, iou = mod.kmeans_anchors(whs, 2, iters=100, logger=lambda *_: None)
    assert iou > 0.8
    (w0, h0), (w1, h1) = anchors  # area-sorted
    assert abs(w0 - 12) < 2 and abs(h0 - 12) < 2
    assert abs(w1 - 40) < 4 and abs(h1 - 20) < 3

    de_anchors, de_iou = mod.de_anchors(
        whs, 2, iters=30, input_shape=(64, 64), logger=lambda *_: None
    )
    assert de_iou > 0.8

    saved = mod.save_result(anchors, str(tmp_path), logger=lambda *_: None)
    import json
    with open(tmp_path / "anchor_optimize_result.json") as f:
        assert json.load(f) == saved


def test_optimize_anchors_collect_whs():
    mod = _load("optimize_anchors.py", "optimize_anchors_tool2")

    class FakeDS:
        data_infos = [{"width": 256, "height": 128}]

        def __len__(self):
            return 1

        def get_ann_info(self, i):
            return {"bboxes": np.array([[0.0, 0.0, 64.0, 32.0]])}

    whs = mod.collect_whs(FakeDS(), (128, 128))
    # rescale by max(256,128)/128 = 2 -> (32, 16)
    np.testing.assert_allclose(whs, [[32.0, 16.0]])
