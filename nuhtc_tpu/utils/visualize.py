"""Detection overlays (host-side cv2) — the save_result / imshow_det_bboxes
equivalents (reference nuhtc/apis/inference.py:60-83,
nuhtc/utils/hooks/mask_vis_hook.py:31)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import cv2
import numpy as np

DEFAULT_PALETTE = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (255, 150, 0),
    (150, 0, 255), (0, 255, 255), (128, 128, 0),
]


def draw_detections(
    img: np.ndarray,  # RGB uint8
    masks: Sequence[np.ndarray],  # per-instance bool/uint8 (H, W)
    labels: Sequence[int],
    scores: Optional[Sequence[float]] = None,
    boxes: Optional[np.ndarray] = None,
    palette: Optional[List] = None,
    thickness: int = 2,
    draw_boxes: bool = False,
) -> np.ndarray:
    out = img.copy()
    palette = palette or DEFAULT_PALETTE
    for i, m in enumerate(masks):
        color = tuple(int(c) for c in palette[int(labels[i]) % len(palette)])
        contours, _ = cv2.findContours(
            m.astype(np.uint8), cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
        )
        if contours:
            cv2.drawContours(out, contours, -1, color, thickness)
        if draw_boxes and boxes is not None:
            x1, y1, x2, y2 = boxes[i].astype(int)
            cv2.rectangle(out, (x1, y1), (x2, y2), color, 1)
    return out
