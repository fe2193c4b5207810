"""COCO-protocol mAP / AR evaluation (bbox + segm + proposal).

Replaces the reference's pycocotools COCOeval dependency (used by
WSICocoDataset.evaluate's 'bbox'/'segm'/'proposal' metrics via mmdet) with a
self-contained implementation of the COCO matching protocol: per-class,
per-IoU-threshold greedy matching of score-sorted detections, 101-point
interpolated AP, averaged over IoU 0.50:0.95.
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


def _match_image(iou: np.ndarray, dt_scores: np.ndarray, thr: float):
    """Greedy COCO matching for one image/class. Returns (dt_matched bool,
    gt_matched bool) in dt score order (iou rows already sorted)."""
    nd, ng = iou.shape
    gt_taken = np.zeros(ng, bool)
    dt_m = np.zeros(nd, bool)
    for d in range(nd):
        best, best_j = thr, -1
        for j in range(ng):
            if gt_taken[j]:
                continue
            if iou[d, j] >= best:
                best, best_j = iou[d, j], j
        if best_j >= 0:
            gt_taken[best_j] = True
            dt_m[d] = True
    return dt_m, gt_taken


def evaluate_map(
    per_image: List[Dict],  # each: {"dt_boxes", "dt_scores", "dt_labels", "gt_boxes", "gt_labels", optional "iou_fn"}
    num_classes: int,
    iou_fn=None,  # optional callable(image_entry, dt_idx, gt_idx sets) → iou matrix (for masks)
) -> Dict[str, float]:
    """Returns mAP, mAP_50, mAP_75 (+ per-class AP)."""
    ap = np.full((len(IOU_THRS), num_classes), np.nan)
    for c in range(num_classes):
        # gather all detections/gts of class c
        records = []  # (score, matched-at-thr array)
        n_gt = 0
        all_matches = []  # per image: (scores, dt_m (T, nd))
        for img in per_image:
            dsel = img["dt_labels"] == c
            gsel = img["gt_labels"] == c
            scores = img["dt_scores"][dsel]
            order = np.argsort(-scores, kind="stable")
            scores = scores[order]
            n_gt += int(gsel.sum())
            if iou_fn is not None:
                iou = iou_fn(img, dsel, gsel)
                iou = iou[order] if iou.size else iou
            else:
                iou = _box_iou(img["dt_boxes"][dsel][order], img["gt_boxes"][gsel])
            dt_m = np.zeros((len(IOU_THRS), len(scores)), bool)
            for t, thr in enumerate(IOU_THRS):
                dt_m[t], _ = _match_image(iou, scores, thr)
            all_matches.append((scores, dt_m))
        if n_gt == 0:
            continue
        scores = np.concatenate([m[0] for m in all_matches]) if all_matches else np.zeros(0)
        if len(scores) == 0:
            ap[:, c] = 0.0
            continue
        order = np.argsort(-scores, kind="stable")
        for t in range(len(IOU_THRS)):
            matched = np.concatenate([m[1][t] for m in all_matches])[order]
            tp = np.cumsum(matched)
            fp = np.cumsum(~matched)
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # monotone precision envelope
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            # 101-point interpolation
            idxs = np.searchsorted(recall, RECALL_THRS, side="left")
            prec_at = np.where(idxs < len(precision), precision[np.minimum(idxs, len(precision) - 1)], 0.0)
            ap[t, c] = prec_at.mean()

    out = {
        "mAP": float(np.nanmean(ap)),
        "mAP_50": float(np.nanmean(ap[0])),
        "mAP_75": float(np.nanmean(ap[5])),
    }
    for c in range(num_classes):
        out[f"AP_class_{c}"] = float(np.nanmean(ap[:, c]))
    return out


def proposal_recall(
    per_image: List[Dict], proposal_nums: Sequence[int] = (100, 300, 1000)
) -> Dict[str, float]:
    """Class-agnostic average recall AR@N over IoU 0.5:0.95."""
    out = {}
    for n in proposal_nums:
        recalls = []
        for thr in IOU_THRS:
            tp, total = 0, 0
            for img in per_image:
                order = np.argsort(-img["dt_scores"], kind="stable")[:n]
                iou = _box_iou(img["dt_boxes"][order], img["gt_boxes"])
                total += iou.shape[1]
                if iou.size:
                    tp += int((iou.max(axis=0) >= thr).sum())
            recalls.append(tp / max(total, 1))
        out[f"AR@{n}"] = float(np.mean(recalls))
    return out
