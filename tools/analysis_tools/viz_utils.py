"""Visualization helpers for the analysis tools (reference
tools/analysis_tools/viz_utils.py): overlay rendering for detections and
ground truth, color palettes, side-by-side GT/pred panels. Thin layer over
nuhtc_tpu.utils.visualize."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from nuhtc_tpu.utils.visualize import DEFAULT_PALETTE, draw_detections  # noqa: F401


def imshow_gt_det(
    img: np.ndarray,
    gt_masks: Sequence[np.ndarray],
    gt_labels: Sequence[int],
    det_masks: Sequence[np.ndarray],
    det_labels: Sequence[int],
    det_scores: Optional[Sequence[float]] = None,
    palette=None,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Side-by-side GT | prediction panel (the reference's
    imshow_gt_det_bboxes analog used by analyze_results)."""
    left = draw_detections(img, gt_masks, gt_labels, palette=palette)
    right = draw_detections(img, det_masks, det_labels, scores=det_scores, palette=palette)
    panel = np.concatenate([left, np.full((img.shape[0], 4, 3), 255, np.uint8), right], axis=1)
    if out_file:
        import cv2

        cv2.imwrite(out_file, panel[..., ::-1])
    return panel


def overlay_instances(img: np.ndarray, inst_map: np.ndarray, palette=None) -> np.ndarray:
    """Render a labeled instance map (e.g. the compact WSI label map or a GT
    instance map) as a colored overlay."""
    ids = [int(i) for i in np.unique(inst_map) if i != 0]
    masks = [inst_map == i for i in ids]
    labels = [(i - 1) % len(palette or DEFAULT_PALETTE) for i in ids]
    return draw_detections(img, masks, labels, palette=palette)
