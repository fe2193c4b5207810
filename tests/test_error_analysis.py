"""pr_curves (COCOeval-accumulate analog with ignore + area semantics) and
the coco_error_analysis tool's 7-band progression (VERDICT r2 item 8)."""

import importlib.util
import os
import sys

import numpy as np

from nuhtc_tpu.eval.coco_map import RECALL_THRS, evaluate_map, pr_curves

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "coco_error_analysis", os.path.join(TOOLS, "coco_error_analysis.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["coco_error_analysis"] = mod
    spec.loader.exec_module(mod)
    return mod


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def _fixture():
    """2 classes; exact match, confusion det, loc-error det, bg FP, missed gt."""
    img = dict(
        dt_boxes=np.asarray(
            [
                _box(0, 0, 10, 10),    # exact match of gt0 (cls 0)
                _box(40, 40, 10, 10),  # cls-0 det on the cls-1 gt (confusion)
                _box(64, 60, 10, 10),  # IoU ~0.23 with gt2 (loc error)
                _box(200, 200, 5, 5),  # background FP
            ],
            np.float32,
        ),
        dt_scores=np.asarray([0.9, 0.8, 0.7, 0.6], np.float32),
        dt_labels=np.asarray([0, 0, 0, 0], np.int64),
        gt_boxes=np.asarray(
            [
                _box(0, 0, 10, 10),      # gt0 cls0
                _box(40, 40, 10, 10),    # gt1 cls1
                _box(60, 60, 10, 10),    # gt2 cls0 (only loosely matched)
                _box(100, 100, 10, 10),  # gt3 cls0 missed entirely
            ],
            np.float32,
        ),
        gt_labels=np.asarray([0, 1, 0, 0], np.int64),
    )
    return [img]


def test_band_progression_monotone(tmp_path):
    mod = _load_tool()
    aps = mod.analyze(_fixture(), ["a", "b"], str(tmp_path), iou_type="bbox",
                      extraplots=True)
    band = aps["a"]["allarea"]
    order = [band[t] for t in ["C75", "C50", "Loc", "Sim", "Oth", "BG", "FN"]]
    assert all(b >= a - 1e-9 for a, b in zip(order, order[1:])), order
    assert np.isclose(band["FN"], 1.0)
    # flat supercategory hierarchy: Sim == Oth
    assert np.isclose(band["Sim"], band["Oth"])
    # confusion forgiveness must strictly help here (the cls-1 gt match)
    assert band["Oth"] > band["Loc"] + 1e-6
    # localization forgiveness must strictly help (the IoU~0.23 det)
    assert band["Loc"] > band["C50"] + 1e-6
    # outputs on disk: 4 area pngs per class + allclass + bar + json
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == 3 * 4 + 1
    assert os.path.exists(tmp_path / "bbox_error_analysis.json")


def test_pr_curves_matches_evaluate_map():
    per_image = _fixture()
    ps = pr_curves(per_image, 2, [0.5], [(0.0, 1e10)])
    base = evaluate_map(per_image, 2)
    # AP@0.5 for class 0 from the curve == evaluate_map's per-threshold math
    ap_curve = float(ps[0, :, 0, 0].mean())
    # evaluate_map averages APs over 10 thresholds; recompute its 0.5 slice
    from nuhtc_tpu.eval import coco_map as CM

    orig = CM.IOU_THRS.copy()
    try:
        CM.IOU_THRS = np.asarray([0.5])
        only50 = evaluate_map(per_image, 2)
    finally:
        CM.IOU_THRS = orig
    assert np.isclose(ap_curve, only50["AP_class_0"], atol=1e-9)
    assert base["mAP"] <= only50["mAP"] + 1e-9


def test_ignore_semantics():
    # one real gt + one ignored gt; one det on each: precision stays perfect
    img = dict(
        dt_boxes=np.asarray([_box(0, 0, 10, 10), _box(50, 50, 10, 10)], np.float32),
        # the to-be-ignored det outranks the real match, so without the
        # ignore flag it is a leading FP that dents interpolated precision
        dt_scores=np.asarray([0.8, 0.9], np.float32),
        dt_labels=np.zeros(2, np.int64),
        gt_boxes=np.asarray([_box(0, 0, 10, 10), _box(50, 50, 10, 10)], np.float32),
        gt_labels=np.zeros(2, np.int64),
        gt_ignore=np.asarray([False, True]),
    )
    ps = pr_curves([img], 1, [0.5], [(0.0, 1e10)])
    assert np.isclose(ps[0, :, 0, 0].max(), 1.0)
    # without the ignore flag the second det is an FP → precision dips
    img2 = dict(img, gt_ignore=np.asarray([False]),
                gt_boxes=img["gt_boxes"][:1], gt_labels=img["gt_labels"][:1])
    ps2 = pr_curves([img2], 1, [0.5], [(0.0, 1e10)])
    assert ps2[0, :, 0, 0].min() < 1.0
    # all gts ignored → -1 sentinel (COCOeval empty-category marker)
    img3 = dict(img, gt_ignore=np.asarray([True, True]))
    assert (pr_curves([img3], 1, [0.5], [(0.0, 1e10)]) == -1).all()


def test_area_ranges():
    # a 4x4 gt (area 16) only counts in the small range
    img = dict(
        dt_boxes=np.asarray([_box(0, 0, 4, 4)], np.float32),
        dt_scores=np.asarray([0.9], np.float32),
        dt_labels=np.zeros(1, np.int64),
        gt_boxes=np.asarray([_box(0, 0, 4, 4)], np.float32),
        gt_labels=np.zeros(1, np.int64),
    )
    ps = pr_curves([img], 1, [0.5], [(0.0, 1e10), (0.0, 32.0), (32.0, 1e10)])
    assert np.isclose(ps[0, :, 0, 0].max(), 1.0)  # allarea
    assert np.isclose(ps[0, :, 0, 1].max(), 1.0)  # small
    assert (ps[0, :, 0, 2] == -1).all()  # large: no gts → sentinel
