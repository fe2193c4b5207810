import numpy as np
import pytest

from nuhtc_tpu.eval.coco_map import evaluate_map, proposal_recall
from nuhtc_tpu.eval.nucls import auroc, mcc, classification_metrics


def _img(dt_boxes, dt_scores, dt_labels, gt_boxes, gt_labels):
    return dict(
        dt_boxes=np.asarray(dt_boxes, np.float32).reshape(-1, 4),
        dt_scores=np.asarray(dt_scores, np.float32),
        dt_labels=np.asarray(dt_labels, np.int64),
        gt_boxes=np.asarray(gt_boxes, np.float32).reshape(-1, 4),
        gt_labels=np.asarray(gt_labels, np.int64),
    )


def test_map_perfect():
    imgs = [
        _img([[0, 0, 10, 10], [20, 20, 40, 40]], [0.9, 0.8], [0, 1],
             [[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1])
    ]
    m = evaluate_map(imgs, num_classes=2)
    assert m["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert m["mAP_50"] == pytest.approx(1.0, abs=1e-6)


def test_map_false_positive_lower():
    imgs = [
        _img([[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.95], [0, 0],
             [[0, 0, 10, 10]], [0])
    ]
    m = evaluate_map(imgs, num_classes=1)
    # higher-scored FP precedes the TP: precision at recall 1 is 0.5
    assert 0.4 < m["mAP_50"] < 0.6


def test_map_localization_quality():
    # detection with iou ~0.6: counts at low thresholds only
    imgs = [_img([[0, 0, 10, 8]], [0.9], [0], [[0, 0, 10, 10]], [0])]
    m = evaluate_map(imgs, num_classes=1)
    assert m["mAP_50"] == pytest.approx(1.0, abs=1e-6)
    assert m["mAP_75"] == pytest.approx(1.0, abs=1e-6)  # iou = 0.8
    assert 0.5 < m["mAP"] < 0.8


def test_proposal_recall():
    imgs = [
        _img([[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [0, 0],
             [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], [0, 0, 0])
    ]
    r = proposal_recall(imgs, proposal_nums=(100,))
    assert r["AR@100"] == pytest.approx(2 / 3, abs=1e-6)


def test_auroc():
    labels = np.array([1, 1, 0, 0])
    assert auroc(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 1.0
    assert auroc(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 0.0
    assert auroc(labels, np.array([0.5, 0.5, 0.5, 0.5])) == pytest.approx(0.5)


def test_mcc():
    y = np.array([0, 0, 1, 1, 2, 2])
    assert mcc(y, y, 3) == pytest.approx(1.0)
    assert abs(mcc(y, (y + 1) % 3, 3)) > 0.4  # total confusion → negative


def test_classification_metrics():
    per_image = [
        dict(
            gt_centroids=np.array([[10.0, 10.0], [30.0, 30.0]]),
            gt_labels=np.array([0, 1]),
            dt_centroids=np.array([[11.0, 10.0], [30.0, 31.0], [90.0, 90.0]]),
            dt_labels=np.array([0, 1, 0]),
            dt_probs=np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]]),
        )
    ]
    m = classification_metrics(per_image, num_classes=2)
    assert m["matched"] == 2
    assert m["accuracy"] == 1.0
    assert m["mcc"] == pytest.approx(1.0)
    assert m["auroc_class_0"] == 1.0
