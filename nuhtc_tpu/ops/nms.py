"""Static-shape batched NMS for TPU.

The reference relies on mmcv's CUDA NMS (`mmcv.ops.nms.batched_nms`; used at
reference nuhtc/models/bbox_head.py:9,93 and RPN proposal generation). On TPU
we need a fixed-shape formulation: this is an **exact** greedy NMS computed
with a tiled suppression sweep — sort boxes by score, then process tiles of
size T sequentially; within a tile run the self-suppression fixpoint
iteration, then suppress all later boxes against the tile's survivors. The
per-step work is dense (T×N IoU matrices on the VPU/MXU) and the sequential
depth is N/T instead of N.

All functions take a validity mask and return masks/indices of static shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(T, 4) x (M, 4) → (T, M) IoU, continuous box convention."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def nms_keep_sorted(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    tile: int = 128,
) -> jnp.ndarray:
    """Greedy NMS keep-mask for boxes already sorted by descending score.

    Args:
        boxes: (N, 4) sorted by score (descending). Padding rows must have
            ``valid=False``.
        valid: (N,) bool.
    Returns:
        keep: (N,) bool — exact greedy-NMS survivors.
    """
    n = boxes.shape[0]
    pad = (-n) % tile
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    n_pad = boxes.shape[0]
    num_tiles = n_pad // tile

    def tile_step(i, state):
        active, keep = state
        start = i * tile
        tboxes = jax.lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        tactive = jax.lax.dynamic_slice(active, (start,), (tile,))

        # --- self-suppression fixpoint inside the tile -------------------
        iou_tt = _pairwise_iou(tboxes, tboxes)
        tri = jnp.tril(jnp.ones((tile, tile), dtype=bool), k=-1)  # j < k → tri[k, j]
        ov = (iou_tt > iou_threshold) & tri.T  # ov[j, k]: j suppresses k (j < k)

        def self_body(state):
            s, _ = state
            suppressed = jnp.any(ov & s[:, None], axis=0)
            s_new = tactive & ~suppressed
            return s_new, jnp.any(s_new != s)

        def self_cond(state):
            return state[1]

        s0 = tactive
        s, _ = jax.lax.while_loop(self_cond, self_body, (s0, jnp.array(True)))

        keep = jax.lax.dynamic_update_slice(keep, s, (start,))

        # --- suppress all later boxes against tile survivors -------------
        iou_tn = _pairwise_iou(tboxes, boxes)  # (tile, n_pad)
        sup = jnp.any(iou_tn > iou_threshold, axis=0, where=s[:, None])
        later = jnp.arange(n_pad) >= start + tile
        active = active & ~(sup & later)
        return active, keep

    keep = jnp.zeros((n_pad,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, num_tiles, tile_step, (valid, keep))
    return keep[:n]


@partial(jax.jit, static_argnames=("max_out", "tile"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    tile: int = 128,
):
    """Greedy NMS. Returns (boxes, scores, idx, valid) of static shape max_out.

    Kept detections are returned in descending score order; padding entries
    have score NEG_INF and valid=False. ``idx`` indexes into the *input*
    arrays.
    """
    scores_m = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores_m)
    sboxes = boxes[order]
    svalid = valid[order]
    keep = nms_keep_sorted(sboxes, svalid, iou_threshold, tile=tile)
    kept_scores = jnp.where(keep, scores_m[order], NEG_INF)
    if max_out > kept_scores.shape[0]:  # fewer candidates than output slots
        pad = max_out - kept_scores.shape[0]
        kept_scores = jnp.pad(kept_scores, (0, pad), constant_values=NEG_INF)
        order = jnp.pad(order, (0, pad))
    top_scores, top_pos = jax.lax.top_k(kept_scores, max_out)
    out_idx = order[top_pos]
    out_valid = top_scores > NEG_INF / 2
    out_boxes = jnp.where(out_valid[:, None], boxes[out_idx], 0.0)
    out_scores = jnp.where(out_valid, scores[out_idx], 0.0)
    return out_boxes, out_scores, out_idx, out_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    class_agnostic: bool = False,
    coord_bound: float | None = None,
    tile: int = 128,
):
    """NMS where boxes with different ``idxs`` never suppress each other.

    Implemented with the mmcv coordinate-offset trick
    (mmcv.ops.nms.batched_nms): shift each group's boxes to a disjoint
    region, run plain NMS, return original boxes.
    """
    if class_agnostic:
        return nms(boxes, scores, valid, iou_threshold, max_out, tile=tile)
    if coord_bound is None:
        coord_bound = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (coord_bound + 1.0)
    shifted = boxes + offsets[:, None]
    ob, os, oi, ov = nms(shifted, scores, valid, iou_threshold, max_out, tile=tile)
    out_boxes = jnp.where(ov[:, None], boxes[oi], 0.0)
    return out_boxes, os, oi, ov
