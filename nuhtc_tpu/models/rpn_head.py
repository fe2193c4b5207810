"""RPN head + static-shape proposal generation.

Matches mmdet RPNHead (thirdparty/mmdetection/mmdet/models/dense_heads/
rpn_head.py; config configs/nuhtc/...PanNuke...py:54-71): 3×3 conv + ReLU,
1×1 sigmoid cls (A anchors), 1×1 reg (A*4); anchors scale 4 / ratios
[0.5,1,2] / strides [4,8,16,32]; DeltaXYWH decode with unit stds.

Proposal generation is a pure function with padded shapes throughout:
per-level top-k by raw sigmoid score, decode, min-size mask, level-separated
NMS (iou 0.7), global top ``max_per_img``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import HEADS
from nuhtc_tpu.ops import boxes as box_ops
from nuhtc_tpu.ops import nms as nms_ops
from nuhtc_tpu.ops.anchors import grid_anchors

Dtype = Any


@HEADS.register()
class RPNHead(nn.Module):
    in_channels: int = 64
    feat_channels: int = 64
    num_anchors: int = 3
    dtype: Dtype = jnp.float32
    # reference config keys accepted for parity
    anchor_generator: Any = None
    bbox_coder: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    reg_decoded_bbox: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: per-level NHWC → (cls_scores, bbox_preds) per level.

        cls: (B, H, W, A); reg: (B, H, W, A*4).
        """
        conv = nn.Conv(self.feat_channels, (3, 3), padding="SAME", dtype=self.dtype, name="rpn_conv")
        cls_conv = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="rpn_reg")
        cls_out, reg_out = [], []
        for f in feats:
            h = nn.relu(conv(f))
            cls_out.append(cls_conv(h))
            reg_out.append(reg_conv(h))
        return cls_out, reg_out


def rpn_proposals_single(
    cls_scores: Sequence[jnp.ndarray],  # per level (H, W, A)
    bbox_preds: Sequence[jnp.ndarray],  # per level (H, W, A*4)
    anchors: Sequence[jnp.ndarray],  # per level (H*W*A, 4)
    img_shape: Tuple[int, int],
    nms_pre: int = 3000,
    max_per_img: int = 1000,
    nms_iou: float = 0.7,
    min_bbox_size: float = 10.0,
):
    """Proposals for one image. Returns (boxes (P,4), scores (P,), valid (P,))
    with P = max_per_img, sorted by score."""
    lvl_boxes, lvl_scores, lvl_ids, lvl_valid = [], [], [], []
    for lvl, (cs, bp, anc) in enumerate(zip(cls_scores, bbox_preds, anchors)):
        scores = jax.nn.sigmoid(cs.reshape(-1).astype(jnp.float32))  # (HWA,)
        deltas = bp.reshape(-1, 4).astype(jnp.float32)
        n = scores.shape[0]
        if 0 < nms_pre < n:
            scores, topk = jax.lax.top_k(scores, nms_pre)
            deltas = deltas[topk]
            anc = anc[topk]
        boxes = box_ops.delta2bbox(anc, deltas, max_shape=img_shape)
        lvl_boxes.append(boxes)
        lvl_scores.append(scores)
        lvl_ids.append(jnp.full((scores.shape[0],), lvl, dtype=jnp.int32))
        lvl_valid.append(jnp.ones((scores.shape[0],), dtype=bool))

    boxes = jnp.concatenate(lvl_boxes)
    scores = jnp.concatenate(lvl_scores)
    ids = jnp.concatenate(lvl_ids)
    valid = jnp.concatenate(lvl_valid)

    if min_bbox_size >= 0:
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = valid & (w > min_bbox_size) & (h > min_bbox_size)

    # cap NMS candidates: suppression flows only from higher scores, so
    # dropping ranks beyond 4*max_per_img cannot change the kept set in
    # practice (would need >3k suppressions inside the top 4k at IoU .7)
    cap = min(4 * max_per_img + 96, boxes.shape[0])
    if boxes.shape[0] > cap:
        top_scores, top_idx = jax.lax.top_k(jnp.where(valid, scores, -1.0), cap)
        boxes = boxes[top_idx]
        scores = scores[top_idx]
        ids = ids[top_idx]
        valid = valid[top_idx] & (top_scores > -0.5)

    coord_bound = float(max(img_shape[0], img_shape[1]))
    out_boxes, out_scores, _, out_valid = nms_ops.batched_nms(
        boxes, scores, ids, valid, nms_iou, max_per_img, coord_bound=coord_bound
    )
    return out_boxes, out_scores, out_valid


def rpn_proposals(
    cls_scores,  # per level (B, H, W, A)
    bbox_preds,  # per level (B, H, W, A*4)
    img_shape: Tuple[int, int],
    strides: Sequence[int] = (4, 8, 16, 32),
    scales: Sequence[float] = (4,),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    nms_pre: int = 3000,
    max_per_img: int = 1000,
    nms_iou: float = 0.7,
    min_bbox_size: float = 10.0,
):
    """Batched proposal generation (vmapped over images)."""
    featmap_sizes = [tuple(cs.shape[1:3]) for cs in cls_scores]
    anchors = [jnp.asarray(a) for a in grid_anchors(featmap_sizes, strides, scales, ratios)]

    return jax.vmap(lambda cs, bp: rpn_proposals_single(
        cs, bp, anchors, img_shape, nms_pre, max_per_img, nms_iou, min_bbox_size
    ))(tuple(cls_scores), tuple(bbox_preds))
