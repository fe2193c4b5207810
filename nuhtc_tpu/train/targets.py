"""Assignment, sampling, and target encoding — static-shape, batched.

Re-designs mmdet's per-image Python assign/sample loops (reference
HybridTaskCascadeRoIHead_Lite.forward_train, nuhtc/models/htc_roi_head_cus.py:
2108-2164, using MaskIoUAssigner == MaxIoUAssigner semantics when no
precomputed overlaps are given — nuhtc/datasets/assigners/mask_iou_assigner.py:
61-111 — and mmdet RandomSampler) as fixed-size masked tensor ops:

- ``max_iou_assign``: the 4-step MaxIoU assignment (background < neg_thr,
  positive ≥ pos_thr, low-quality best-per-gt matches ≥ min_pos_iou, with
  ascending-gt override order);
- ``random_sample``: RandomSampler with ``num`` slots and pos_fraction via
  a priority construction (random rank among positives capped at
  num_expected_pos, then negatives fill the rest) — exactly mmdet's
  "sample min(npos, expected) positives, fill with negatives";
- ``encode_stage_targets``: per-sampled-roi classification labels + DeltaXYWH
  regression targets;
- ``mask_targets_from_patches``: 28×28 mask targets by bilinear-sampling the
  per-instance GT mask patch (rasterized in its gt-box frame) over the
  proposal box — the static-shape equivalent of mmdet's
  BitmapMasks.crop_and_resize (roi_align on full-res GT bitmaps).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nuhtc_tpu.ops import boxes as box_ops


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray  # (N,) int32: -1 ignore, 0 negative, g+1 positive
    max_iou: jnp.ndarray  # (N,)
    labels: jnp.ndarray  # (N,) class label of assigned gt (or -1)


def max_iou_assign(
    boxes: jnp.ndarray,  # (N, 4)
    boxes_valid: jnp.ndarray,  # (N,)
    gt: jnp.ndarray,  # (G, 4)
    gt_valid: jnp.ndarray,  # (G,)
    gt_labels: jnp.ndarray,  # (G,)
    pos_thr: float,
    neg_thr: float,
    min_pos_iou: float = 0.0,
    match_low_quality: bool = True,
) -> AssignResult:
    n, g = boxes.shape[0], gt.shape[0]
    iou = box_ops.bbox_overlaps(boxes, gt)  # (N, G)
    iou = jnp.where(gt_valid[None, :] & boxes_valid[:, None], iou, -1.0)

    max_iou = jnp.max(iou, axis=1)
    argmax = jnp.argmax(iou, axis=1)

    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = jnp.where((max_iou >= 0) & (max_iou < neg_thr), 0, assigned)
    assigned = jnp.where(max_iou >= pos_thr, argmax.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        gt_best = jnp.max(iou, axis=0)  # (G,)
        eligible = (iou == gt_best[None, :]) & (gt_best[None, :] >= min_pos_iou) & gt_valid[None, :]
        # mmdet iterates gts in ascending order; later gt overrides → pick max g
        gidx = jnp.arange(1, g + 1, dtype=jnp.int32)[None, :]
        best_g = jnp.max(jnp.where(eligible, gidx, 0), axis=1)
        assigned = jnp.where(best_g > 0, best_g, assigned)

    assigned = jnp.where(boxes_valid, assigned, -1)
    # mmdet MaxIoUAssigner special-cases num_gts == 0 as ALL-BACKGROUND
    # (assign_result with gt_inds=0): without this, the masked iou is -1
    # everywhere and every proposal stays at ignore, so empty tiles (and
    # semi-sup images whose teacher produced no pseudo boxes) would
    # contribute zero negatives to training.
    no_gt = ~jnp.any(gt_valid)
    assigned = jnp.where(no_gt & boxes_valid, 0, assigned)
    labels = jnp.where(
        assigned > 0, gt_labels[jnp.clip(assigned - 1, 0, g - 1)], -1
    ).astype(jnp.int32)
    return AssignResult(assigned, max_iou, labels)


class SampleResult(NamedTuple):
    idx: jnp.ndarray  # (num,) indices into the candidate set
    is_pos: jnp.ndarray  # (num,) bool
    valid: jnp.ndarray  # (num,) bool (slot used at all)
    gt_inds: jnp.ndarray  # (num,) 0-based assigned gt (pos only; else 0)
    labels: jnp.ndarray  # (num,) class labels for pos, num_classes for neg


def random_sample(
    key: jax.Array,
    assign: AssignResult,
    num: int,
    pos_fraction: float,
    num_classes: int,
) -> SampleResult:
    n = assign.gt_inds.shape[0]
    num_pos_expected = int(num * pos_fraction)
    pos_mask = assign.gt_inds > 0
    neg_mask = assign.gt_inds == 0

    kp, kn = jax.random.split(key)
    rp = jax.random.uniform(kp, (n,))
    rn = jax.random.uniform(kn, (n,))

    def rank_of(mask, r):
        keys = jnp.where(mask, r, jnp.inf)
        order = jnp.argsort(keys)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        return rank

    pos_rank = rank_of(pos_mask, rp)
    neg_rank = rank_of(neg_mask, rn)

    big = jnp.float32(1e9)
    prio = jnp.where(pos_mask & (pos_rank < num_pos_expected), pos_rank.astype(jnp.float32), big)
    prio = jnp.where(neg_mask & (neg_rank < num), 1e6 + neg_rank.astype(jnp.float32), prio)

    if n < num:  # fewer candidates than slots (tiny inputs): pad with invalid
        prio = jnp.pad(prio, (0, num - n), constant_values=big)

    neg_prio, idx = jax.lax.top_k(-prio, num)
    idx = jnp.minimum(idx, n - 1)
    sel_prio = -neg_prio
    valid = sel_prio < big
    is_pos = valid & (sel_prio < 1e6)
    gt_inds = jnp.where(is_pos, assign.gt_inds[idx] - 1, 0)
    labels = jnp.where(is_pos, assign.labels[idx], num_classes)
    labels = jnp.where(valid, labels, num_classes)
    return SampleResult(idx, is_pos, valid, gt_inds.astype(jnp.int32), labels.astype(jnp.int32))


def encode_stage_targets(
    rois: jnp.ndarray,  # (S, 4) sampled boxes
    sample: SampleResult,
    gt: jnp.ndarray,  # (G, 4)
    stds: Tuple[float, float, float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (bbox_targets (S, 4), bbox_weights (S,))."""
    tgt_boxes = gt[sample.gt_inds]
    deltas = box_ops.bbox2delta(rois, tgt_boxes, stds=stds)
    w = sample.is_pos.astype(jnp.float32)
    return jnp.where(sample.is_pos[:, None], deltas, 0.0), w


def mask_targets_from_patches(
    proposals: jnp.ndarray,  # (S, 4) positive proposal boxes (image coords)
    gt_inds: jnp.ndarray,  # (S,) assigned gt index
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_patches: jnp.ndarray,  # (G, M, M) per-instance mask in gt-box frame
    mask_size: int = 28,
) -> jnp.ndarray:
    """Bilinear-sample GT mask patches over proposal boxes → (S, m, m) targets."""
    g, m, _ = gt_patches.shape
    s = proposals.shape[0]
    boxes = gt_boxes[gt_inds]  # (S, 4)
    patches = gt_patches[gt_inds]  # (S, M, M)

    def axis_coords(p0, p1, b0, b1):
        # image coord of bin center i: p0 + (i + .5) * (p1 - p0)/mask_size
        i = jnp.arange(mask_size, dtype=jnp.float32)
        t = p0[:, None] + (i[None, :] + 0.5) * (p1 - p0)[:, None] / mask_size
        # map into patch pixel coords: (t - b0) / (b1 - b0) * M - 0.5
        ext = jnp.maximum(b1 - b0, 1e-6)
        return (t - b0[:, None]) / ext[:, None] * m - 0.5  # (S, mask_size)

    uy = axis_coords(proposals[:, 1], proposals[:, 3], boxes[:, 1], boxes[:, 3])
    ux = axis_coords(proposals[:, 0], proposals[:, 2], boxes[:, 0], boxes[:, 2])

    def interp_mat(u):
        low = jnp.floor(u)
        frac = u - low
        low_i = jnp.clip(low, -1, m).astype(jnp.int32)

        def oh(ix):
            inr = (ix >= 0) & (ix < m)
            return jax.nn.one_hot(jnp.clip(ix, 0, m - 1), m, dtype=jnp.float32) * inr[..., None]

        return oh(low_i) * (1 - frac)[..., None] + oh(low_i + 1) * frac[..., None]

    my = interp_mat(uy)  # (S, mask_size, M)
    mx = interp_mat(ux)
    out = jnp.einsum(
        "sim,smn,sjn->sij", my, patches.astype(jnp.float32), mx,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (out >= 0.5).astype(jnp.float32)
