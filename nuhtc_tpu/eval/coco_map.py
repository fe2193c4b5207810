"""COCO-protocol mAP / AR evaluation (bbox + segm + proposal).

Replaces the reference's pycocotools COCOeval dependency (used by
WSICocoDataset.evaluate's 'bbox'/'segm'/'proposal' metrics via mmdet) with a
self-contained implementation of the COCO matching protocol: per-class,
per-IoU-threshold greedy matching of score-sorted detections capped at
``max_dets`` per image (COCOeval maxDets=100 for the headline mAP),
101-point interpolated AP, averaged over IoU 0.50:0.95.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0, 1, 101)


def _box_iou(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    lt = np.maximum(dt[:, None, :2], gt[None, :, :2])
    rb = np.minimum(dt[:, None, 2:4], gt[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1])
    a2 = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


def _match_image(iou: np.ndarray, thr: float):
    """Greedy COCO matching for one image/class. Returns (dt_matched bool,
    gt_matched bool) in dt score order (iou rows already sorted). The scan
    over detections is inherently sequential; the per-row best-gt pick is
    vectorized."""
    nd, ng = iou.shape
    gt_taken = np.zeros(ng, bool)
    dt_m = np.zeros(nd, bool)
    for d in range(nd):
        row = np.where(gt_taken, -1.0, iou[d])
        j = int(np.argmax(row)) if ng else -1
        if ng and row[j] >= thr:
            gt_taken[j] = True
            dt_m[d] = True
    return dt_m, gt_taken


def evaluate_map(
    per_image: List[Dict],  # each: {"dt_boxes", "dt_scores", "dt_labels", "gt_boxes", "gt_labels", optional "iou_fn"}
    num_classes: int,
    iou_fn=None,  # optional callable(image_entry, dt_idx, gt_idx sets) → iou matrix (for masks)
    max_dets: int = 100,  # COCOeval maxDets for the headline mAP
) -> Dict[str, float]:
    """Returns mAP, mAP_50, mAP_75 (+ per-class AP)."""
    iou_thrs = IOU_THRS
    ap = np.full((len(iou_thrs), num_classes), np.nan)
    for c in range(num_classes):
        # gather all detections/gts of class c
        n_gt = 0
        all_matches = []  # per image: (scores, dt_m (T, nd))
        for img in per_image:
            dsel = img["dt_labels"] == c
            gsel = img["gt_labels"] == c
            scores = img["dt_scores"][dsel]
            order = np.argsort(-scores, kind="stable")[:max_dets]
            scores = scores[order]
            n_gt += int(gsel.sum())
            if iou_fn is not None:
                iou = iou_fn(img, dsel, gsel)
                iou = iou[order] if iou.size else iou
            else:
                iou = _box_iou(img["dt_boxes"][dsel][order], img["gt_boxes"][gsel])
            dt_m = np.zeros((len(iou_thrs), len(scores)), bool)
            for t, thr in enumerate(iou_thrs):
                dt_m[t], _ = _match_image(iou, thr)
            all_matches.append((scores, dt_m))
        if n_gt == 0:
            continue
        scores = np.concatenate([m[0] for m in all_matches]) if all_matches else np.zeros(0)
        if len(scores) == 0:
            ap[:, c] = 0.0
            continue
        order = np.argsort(-scores, kind="stable")
        for t in range(len(iou_thrs)):
            matched = np.concatenate([m[1][t] for m in all_matches])[order]
            tp = np.cumsum(matched)
            fp = np.cumsum(~matched)
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # monotone precision envelope
            precision = np.maximum.accumulate(precision[::-1])[::-1]
            # 101-point interpolation
            idxs = np.searchsorted(recall, RECALL_THRS, side="left")
            prec_at = np.where(idxs < len(precision), precision[np.minimum(idxs, len(precision) - 1)], 0.0)
            ap[t, c] = prec_at.mean()

    # index IoU 0.50/0.75 by value so overridden IOU_THRS (e.g.
    # coco_error_analysis' single-threshold re-eval) keeps working
    def _ap_at(v: float) -> float:
        hits = np.where(np.isclose(iou_thrs, v))[0]
        return float(np.nanmean(ap[hits[0]])) if len(hits) else float("nan")

    out = {
        "mAP": float(np.nanmean(ap)),
        "mAP_50": _ap_at(0.5),
        "mAP_75": _ap_at(0.75),
    }
    for c in range(num_classes):
        out[f"AP_class_{c}"] = float(np.nanmean(ap[:, c]))
    return out


def proposal_recall(
    per_image: List[Dict], proposal_nums: Sequence[int] = (100, 300, 1000)
) -> Dict[str, float]:
    """Class-agnostic average recall AR@N over IoU 0.5:0.95. The IoU matrix
    is computed once per image at max(N) and sliced for the smaller caps."""
    nums = sorted(proposal_nums)
    per_n_tp = {n: np.zeros(len(IOU_THRS), np.int64) for n in nums}
    total = 0
    for img in per_image:
        order = np.argsort(-img["dt_scores"], kind="stable")[: nums[-1]]
        iou = _box_iou(img["dt_boxes"][order], img["gt_boxes"])
        total += iou.shape[1]
        if not iou.size:
            continue
        for n in nums:
            best = iou[:n].max(axis=0) if len(iou[:n]) else np.zeros(iou.shape[1])
            per_n_tp[n] += (best[None, :] >= IOU_THRS[:, None]).sum(axis=1)
    out = {}
    for n in proposal_nums:
        out[f"AR@{n}"] = float(np.mean(per_n_tp[n] / max(total, 1)))
    return out
