"""Anchor generation, matching mmdet 2.x AnchorGenerator semantics.

Reference config (configs/nuhtc/htc_lite_swin_pytorch_fpn_PanNuke_seasaw_CAS.py:59-63):
scales=[4], ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32], centered at
stride/2 offsets? mmdet uses center_offset=0 by default: base anchors are
centered at (0, 0) and shifted by integer multiples of the stride.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def base_anchors(stride: int, scales: Sequence[float], ratios: Sequence[float]) -> np.ndarray:
    """(num_ratios*num_scales, 4) base anchors centered at stride*center_offset (=0)."""
    w = h = float(stride)
    x_center = y_center = 0.0
    out = []
    for r in ratios:
        h_ratio = np.sqrt(r)
        w_ratio = 1.0 / h_ratio
        for s in scales:
            ws = w * w_ratio * s
            hs = h * h_ratio * s
            out.append(
                [x_center - 0.5 * ws, y_center - 0.5 * hs, x_center + 0.5 * ws, y_center + 0.5 * hs]
            )
    return np.asarray(out, dtype=np.float32)


def grid_anchors(
    featmap_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    scales: Sequence[float],
    ratios: Sequence[float],
) -> List[np.ndarray]:
    """Per-level anchors, each (H*W*A, 4), row-major over (y, x, anchor)."""
    all_anchors = []
    for (fh, fw), stride in zip(featmap_sizes, strides):
        base = base_anchors(stride, scales, ratios)  # (A, 4)
        shift_x = np.arange(fw, dtype=np.float32) * stride
        shift_y = np.arange(fh, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
    return all_anchors
