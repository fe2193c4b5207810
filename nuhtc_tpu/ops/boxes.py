"""Box primitives: delta coding, IoU, clipping — all static-shape jnp.

Delta coder semantics follow the reference's DeltaXYWHBBoxCoder
(thirdparty/mmdetection/mmdet/core/bbox/coder/delta_xywh_bbox_coder.py):
boxes are [x1, y1, x2, y2]; widths/heights computed as x2-x1 (continuous
convention), deltas normalized by (means, stds), dw/dh clamped to
|log(wh_ratio_clip)|.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def delta2bbox(
    rois: jnp.ndarray,
    deltas: jnp.ndarray,
    means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
    stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    max_shape: Tuple[int, int] | None = None,
    wh_ratio_clip: float = 16 / 1000,
) -> jnp.ndarray:
    """Decode deltas w.r.t. rois. rois: (..., 4), deltas: (..., 4)."""
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    denorm = deltas * stds + means
    dx, dy, dw, dh = denorm[..., 0], denorm[..., 1], denorm[..., 2], denorm[..., 3]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h, w = max_shape[:2]
        out = jnp.stack(
            [
                jnp.clip(out[..., 0], 0, w),
                jnp.clip(out[..., 1], 0, h),
                jnp.clip(out[..., 2], 0, w),
                jnp.clip(out[..., 3], 0, h),
            ],
            axis=-1,
        )
    return out


def bbox2delta(
    proposals: jnp.ndarray,
    gt: jnp.ndarray,
    means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
    stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Encode gt boxes w.r.t. proposals (training targets)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], eps)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], eps)

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], eps)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], eps)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def bbox_overlaps(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, mode: str = "iou", eps: float = 1e-6
) -> jnp.ndarray:
    """Pairwise IoU/IoF. boxes1: (N, 4), boxes2: (M, 4) → (N, M).

    Continuous-coordinate convention (w = x2 - x1), matching mmdet 2.x
    `bbox_overlaps`.
    """
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])

    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        union = area1[:, None] + area2[None, :] - inter
    elif mode == "iof":
        union = jnp.broadcast_to(area1[:, None], inter.shape)
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(union, eps)


def clip_boxes(boxes: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    h, w = shape[:2]
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
