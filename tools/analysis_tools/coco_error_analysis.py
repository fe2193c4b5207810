#!/usr/bin/env python
"""Detection error analysis (reference tools/analysis_tools/
coco_error_analysis.py): decomposes per-class AP by progressively forgiving
error types — localization (IoU 0.1 match), class confusion, background FP,
missed GT — from a pickled results file.

Usage: python tools/analysis_tools/coco_error_analysis.py <config> <results.pkl>
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("results")
    args = ap.parse_args()

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.eval.coco_map import evaluate_map, _box_iou

    cfg = Config.fromfile(args.config)
    dataset = build_dataset({**cfg.data.test, "test_mode": True})
    with open(args.results, "rb") as f:
        results = pickle.load(f)

    num_classes = len(dataset.CLASSES)
    per_image = []
    for idx, (bbox_res, _) in enumerate(results):
        ann = dataset.get_ann_info(idx)
        boxes = np.concatenate(bbox_res) if len(bbox_res) else np.zeros((0, 5))
        labels = np.concatenate(
            [np.full(len(b), c, np.int64) for c, b in enumerate(bbox_res)]
        ) if len(bbox_res) else np.zeros(0, np.int64)
        per_image.append(
            dict(
                dt_boxes=boxes[:, :4].astype(np.float32),
                dt_scores=boxes[:, 4].astype(np.float32),
                dt_labels=labels,
                gt_boxes=ann["bboxes"],
                gt_labels=ann["labels"],
            )
        )

    base = evaluate_map(per_image, num_classes)
    print(f"mAP: {base['mAP']:.4f}  mAP_50: {base['mAP_50']:.4f}")

    # forgive localization: count matches at IoU >= 0.1
    loc = [dict(p) for p in per_image]
    # evaluate with a single loose threshold by boosting IoU artificially:
    from nuhtc_tpu.eval import coco_map as CM

    orig_thrs = CM.IOU_THRS.copy()
    try:
        CM.IOU_THRS = np.asarray([0.1])
        loose = evaluate_map(per_image, num_classes)
        print(f"AP@0.1 (forgive localization): {loose['mAP']:.4f}")
        # forgive class confusion: single-class everything
        agn = [
            dict(p, dt_labels=np.zeros_like(p["dt_labels"]),
                 gt_labels=np.zeros_like(p["gt_labels"]))
            for p in per_image
        ]
        agn_res = evaluate_map(agn, 1)
        print(f"AP@0.1 class-agnostic (also forgive confusion): {agn_res['mAP']:.4f}")
    finally:
        CM.IOU_THRS = orig_thrs

    # background FP rate / missed GT
    n_dt = sum(len(p["dt_scores"]) for p in per_image)
    n_gt = sum(len(p["gt_labels"]) for p in per_image)
    fp_bg = 0
    missed = 0
    for p in per_image:
        iou = _box_iou(p["dt_boxes"], p["gt_boxes"])
        if iou.size:
            fp_bg += int((iou.max(axis=1) < 0.1).sum())
            missed += int((iou.max(axis=0) < 0.1).sum())
        else:
            fp_bg += len(p["dt_boxes"])
            missed += len(p["gt_boxes"])
    print(f"detections: {n_dt}  gts: {n_gt}")
    print(f"background FPs (no gt overlap ≥0.1): {fp_bg} ({100 * fp_bg / max(n_dt, 1):.1f}%)")
    print(f"missed GTs (no det overlap ≥0.1): {missed} ({100 * missed / max(n_gt, 1):.1f}%)")


if __name__ == "__main__":
    main()
