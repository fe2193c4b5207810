"""Instance-segmentation metrics: PQ / AJI / AJI+ / Dice (host-side numpy).

Same quantities as the reference metric engine (nuhtc/utils/stats_utils.py:
34-507 — get_fast_aji, get_fast_aji_plus, get_fast_pq, get_fast_dice_2,
remap_label, pair_coordinates, stat_calc), reimplemented from the metric
definitions:

- PQ (Kirillov et al.): match instances with IoU > match_iou (unique for
  iou > 0.5, Hungarian otherwise); DQ = TP / (TP + FP/2 + FN/2);
  SQ = mean matched IoU; PQ = DQ * SQ.
- AJI (Kumar et al.): greedy per-GT best-IoU pairing;
  AJI = Σ matched intersections / (Σ matched unions + unmatched areas).
- AJI+ : Hungarian pairing variant.

All functions take integer instance-label maps (0 = background).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def remap_label(pred: np.ndarray, by_size: bool = False) -> np.ndarray:
    """Relabel instances contiguously 1..N (optionally largest-first)."""
    ids = np.unique(pred)
    ids = ids[ids != 0]
    if len(ids) == 0:
        return np.zeros_like(pred)
    if by_size:
        sizes = [(pred == i).sum() for i in ids]
        ids = ids[np.argsort(sizes)[::-1]]
    out = np.zeros_like(pred)
    for new_id, old_id in enumerate(ids, 1):
        out[pred == old_id] = new_id
    return out


def _instance_masks(labmap: np.ndarray) -> List[np.ndarray]:
    ids = np.unique(labmap)
    ids = ids[ids != 0]
    return [labmap == i for i in ids]


def _pairwise_inter_union(true: np.ndarray, pred: np.ndarray):
    """Intersection/union tables between all true and pred instances.

    Assumes contiguous labels 1..T and 1..P. Computed with a joint histogram
    (O(H*W)) instead of per-pair mask ops.
    """
    t_max = int(true.max())
    p_max = int(pred.max())
    if t_max == 0 or p_max == 0:
        return (
            np.zeros((t_max, p_max)),
            np.zeros((t_max, p_max)),
            np.array([(true == i + 1).sum() for i in range(t_max)], np.float64),
            np.array([(pred == i + 1).sum() for i in range(p_max)], np.float64),
        )
    joint = (true.astype(np.int64) * (p_max + 1) + pred.astype(np.int64)).ravel()
    counts = np.bincount(joint, minlength=(t_max + 1) * (p_max + 1)).reshape(
        t_max + 1, p_max + 1
    )
    inter = counts[1:, 1:].astype(np.float64)
    t_areas = counts[1:, :].sum(axis=1).astype(np.float64)
    p_areas = counts[:, 1:].sum(axis=0).astype(np.float64)
    union = t_areas[:, None] + p_areas[None, :] - inter
    return inter, union, t_areas, p_areas


def get_fast_pq(true: np.ndarray, pred: np.ndarray, match_iou: float = 0.5):
    """Panoptic quality. Returns ([dq, sq, pq],
    [paired_true_ids, paired_pred_ids, unpaired_true_ids, unpaired_pred_ids]).
    IDs are 1-based instance labels."""
    assert match_iou >= 0.0
    true = remap_label(true)
    pred = remap_label(pred)
    inter, union, _, _ = _pairwise_inter_union(true, pred)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)

    if iou.size == 0:
        paired_t = np.zeros(0, np.int64)
        paired_p = np.zeros(0, np.int64)
        paired_iou = np.zeros(0)
    elif match_iou >= 0.5:
        ti, pi = np.nonzero(iou > match_iou)
        paired_t, paired_p = ti + 1, pi + 1
        paired_iou = iou[ti, pi]
    else:
        cost = -iou
        ti, pi = linear_sum_assignment(cost)
        keep = iou[ti, pi] > match_iou
        paired_t, paired_p = ti[keep] + 1, pi[keep] + 1
        paired_iou = iou[ti[keep], pi[keep]]

    t_total = int(true.max())
    p_total = int(pred.max())
    unpaired_t = np.setdiff1d(np.arange(1, t_total + 1), paired_t)
    unpaired_p = np.setdiff1d(np.arange(1, p_total + 1), paired_p)
    tp = len(paired_t)
    fp = len(unpaired_p)
    fn = len(unpaired_t)
    dq = tp / (tp + 0.5 * fp + 0.5 * fn) if (tp + fp + fn) > 0 else 0.0
    sq = paired_iou.sum() / (tp + 1e-6)
    return [dq, sq, dq * sq], [paired_t, paired_p, unpaired_t, unpaired_p]


def get_fast_aji(true: np.ndarray, pred: np.ndarray) -> float:
    """Aggregated Jaccard Index, greedy best-IoU pairing per GT instance."""
    true = remap_label(true)
    pred = remap_label(pred)
    if true.max() == 0:
        return 0.0
    inter, union, t_areas, p_areas = _pairwise_inter_union(true, pred)
    if pred.max() == 0:
        return 0.0
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    paired_p = iou.argmax(axis=1)
    paired_iou = iou[np.arange(iou.shape[0]), paired_p]
    matched = paired_iou > 0
    used_p = set()
    inter_sum = 0.0
    union_sum = 0.0
    for t_idx in range(iou.shape[0]):
        if matched[t_idx]:
            p_idx = paired_p[t_idx]
            if p_idx in used_p:
                # reference greedily lets multiple GT pick the same pred;
                # only first contributes its union once — emulate by summing
                # intersections and full unions per pairing (reference adds
                # inter and union per matched GT)
                inter_sum += inter[t_idx, p_idx]
                union_sum += union[t_idx, p_idx] - p_areas[p_idx]
            else:
                used_p.add(p_idx)
                inter_sum += inter[t_idx, p_idx]
                union_sum += union[t_idx, p_idx]
        else:
            union_sum += t_areas[t_idx]
    for p_idx in range(iou.shape[1]):
        if p_idx not in used_p:
            union_sum += p_areas[p_idx]
    return float(inter_sum / union_sum) if union_sum > 0 else 0.0


def get_fast_aji_plus(true: np.ndarray, pred: np.ndarray) -> float:
    """AJI with optimal (Hungarian) unique pairing."""
    true = remap_label(true)
    pred = remap_label(pred)
    if true.max() == 0 or pred.max() == 0:
        return 0.0
    inter, union, t_areas, p_areas = _pairwise_inter_union(true, pred)
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    ti, pi = linear_sum_assignment(-iou)
    keep = iou[ti, pi] > 0
    ti, pi = ti[keep], pi[keep]
    inter_sum = inter[ti, pi].sum()
    union_sum = union[ti, pi].sum()
    unpaired_t = np.setdiff1d(np.arange(iou.shape[0]), ti)
    unpaired_p = np.setdiff1d(np.arange(iou.shape[1]), pi)
    union_sum += t_areas[unpaired_t].sum() + p_areas[unpaired_p].sum()
    return float(inter_sum / union_sum) if union_sum > 0 else 0.0


def get_fast_dice_2(true: np.ndarray, pred: np.ndarray) -> float:
    """Ensemble dice: per matched-instance dice, averaged by overlap pairing."""
    true = remap_label(true)
    pred = remap_label(pred)
    if true.max() == 0 or pred.max() == 0:
        return 0.0
    inter, _, t_areas, p_areas = _pairwise_inter_union(true, pred)
    total_markup = 0.0
    total_intersect = 0.0
    for t_idx in range(inter.shape[0]):
        overlaps = np.nonzero(inter[t_idx] > 0)[0]
        for p_idx in overlaps:
            total_intersect += inter[t_idx, p_idx]
            total_markup += t_areas[t_idx] + p_areas[p_idx]
    return float(2 * total_intersect / total_markup) if total_markup > 0 else 0.0


def get_dice_1(true: np.ndarray, pred: np.ndarray) -> float:
    """Plain foreground dice."""
    t = true > 0
    p = pred > 0
    denom = t.sum() + p.sum()
    return float(2 * np.logical_and(t, p).sum() / denom) if denom > 0 else 0.0


def pair_coordinates(
    set_a: np.ndarray, set_b: np.ndarray, radius: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hungarian pairing of 2D point sets within ``radius`` (centroid F1).

    Returns (pairing (K, 2) index pairs, unpaired_a, unpaired_b)."""
    if len(set_a) == 0 or len(set_b) == 0:
        return (
            np.zeros((0, 2), np.int64),
            np.arange(len(set_a)),
            np.arange(len(set_b)),
        )
    dist = np.linalg.norm(set_a[:, None, :] - set_b[None, :, :], axis=-1)
    ai, bi = linear_sum_assignment(dist)
    keep = dist[ai, bi] <= radius
    pairing = np.stack([ai[keep], bi[keep]], axis=-1)
    unpaired_a = np.setdiff1d(np.arange(len(set_a)), pairing[:, 0])
    unpaired_b = np.setdiff1d(np.arange(len(set_b)), pairing[:, 1])
    return pairing, unpaired_a, unpaired_b


def stat_calc(true: np.ndarray, pred: np.ndarray) -> Dict[str, float]:
    """All per-image metrics (reference stat_calc, stats_utils.py:457)."""
    pq_res, _ = get_fast_pq(true, pred)
    return {
        "aji": get_fast_aji(true, pred),
        "aji_plus": get_fast_aji_plus(true, pred),
        "dq": pq_res[0],
        "sq": pq_res[1],
        "pq": pq_res[2],
        "dice": get_dice_1(true, pred),
        "dice2": get_fast_dice_2(true, pred),
    }
