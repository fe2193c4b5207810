"""Reference-mode confusion_matrix tool (reference confusion_matrix.py:60-145):
pairwise GT×det counting, background FP row, FN column, score/NMS gating."""

import importlib.util
import os
import sys

import numpy as np

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load():
    spec = importlib.util.spec_from_file_location(
        "cm_tool", os.path.join(TOOLS, "confusion_matrix.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["cm_tool"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_analyze_per_img_dets_reference_semantics():
    mod = _load()
    cm = np.zeros((3, 3))  # 2 classes + background
    gt_bboxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_labels = np.array([0, 1])
    # class-0 dets: one TP on gt0, one far-off BG FP, one below score_thr
    # class-1 dets: one hits gt0 (wrong class) → cm[0,1], gt1 never matched → FN
    result = [
        np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8], [0, 0, 10, 10, 0.1]],
                 np.float32),
        np.array([[1, 1, 10, 10, 0.7]], np.float32),
    ]
    mod.analyze_per_img_dets(cm, gt_bboxes, gt_labels, result, score_thr=0.3)
    assert cm[0, 0] == 1           # TP
    assert cm[2, 0] == 1           # bg FP (far-off det, class 0)
    assert cm[0, 1] == 1           # class-1 det over class-0 gt
    assert cm[1, 2] == 1           # gt1 FN
    assert cm[1, 0] == 0 and cm[1, 1] == 0


def test_one_det_over_two_gts_counts_both():
    # reference :129-141: a det matching k GTs adds k cells (no 1-1 matching)
    mod = _load()
    cm = np.zeros((2, 2))
    gt = np.array([[0, 0, 10, 10], [2, 2, 12, 12]], np.float32)
    labels = np.array([0, 0])
    det = [np.array([[1, 1, 11, 11, 0.9]], np.float32)]
    mod.analyze_per_img_dets(cm, gt, labels, det, score_thr=0.0, tp_iou_thr=0.3)
    assert cm[0, 0] == 2
    assert cm[0, 1] == 0  # both gts matched → no FN


def test_nms_iou_thr_dedups():
    mod = _load()
    cm = np.zeros((2, 2))
    gt = np.array([[0, 0, 10, 10]], np.float32)
    labels = np.array([0])
    det = [np.array([[0, 0, 10, 10, 0.9], [0.5, 0.5, 10, 10, 0.8]], np.float32)]
    mod.analyze_per_img_dets(cm, gt, labels, det, score_thr=0.0,
                             tp_iou_thr=0.5, nms_iou_thr=0.5)
    assert cm[0, 0] == 1  # duplicate suppressed by NMS


def test_calculate_and_plot(tmp_path):
    mod = _load()

    class DS:
        CLASSES = ("a", "b")

        def __len__(self):
            return 1

        def get_ann_info(self, i):
            return dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                        labels=np.array([0]))

    results = [([np.array([[0, 0, 10, 10, 0.9]], np.float32),
                 np.zeros((0, 5), np.float32)],
                [[], []])]
    cm = mod.calculate_confusion_matrix(DS(), results, score_thr=0.3)
    assert cm[0, 0] == 1
    out = mod.plot_confusion_matrix(cm, ["a", "b", "background"],
                                    str(tmp_path / "cm.png"), normalize=True)
    assert os.path.exists(out)
