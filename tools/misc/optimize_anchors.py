#!/usr/bin/env python
"""Anchor optimization over a dataset's GT boxes (reference
tools/analysis_tools/optimize_anchors.py): k-means over box scales/ratios
and differential-evolution-free greedy refinement of anchor scale.

Usage: python tools/misc/optimize_anchors.py <config> [--num-anchors 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def iou_wh(wh1, wh2):
    """IoU of boxes sharing a center. wh1 (N,2), wh2 (K,2) → (N,K)."""
    inter = np.minimum(wh1[:, None, 0], wh2[None, :, 0]) * np.minimum(
        wh1[:, None, 1], wh2[None, :, 1]
    )
    a1 = wh1[:, 0] * wh1[:, 1]
    a2 = wh2[:, 0] * wh2[:, 1]
    return inter / (a1[:, None] + a2[None, :] - inter)


def kmeans_anchors(whs: np.ndarray, k: int, iters: int = 100, seed: int = 0):
    rng = np.random.RandomState(seed)
    centers = whs[rng.choice(len(whs), k, replace=False)].astype(np.float64)
    for _ in range(iters):
        assign = iou_wh(whs, centers).argmax(1)
        new = np.stack(
            [np.median(whs[assign == i], axis=0) if (assign == i).any() else centers[i]
             for i in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    return centers[np.argsort(centers.prod(1))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--num-anchors", type=int, default=3)
    ap.add_argument("--scale-factor", type=float, default=2.0, help="test rescale")
    args = ap.parse_args()

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.data.loader import CASDataset

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.data.train)
    inner = ds.dataset if isinstance(ds, CASDataset) else ds
    whs = []
    for i in range(len(inner)):
        ann = inner.get_ann_info(i)
        b = ann["bboxes"] * args.scale_factor
        if len(b):
            whs.append(np.stack([b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1))
    whs = np.concatenate(whs)
    centers = kmeans_anchors(whs, args.num_anchors)
    mean_iou = iou_wh(whs, centers).max(1).mean()
    print(f"gt boxes: {len(whs)}, mean wh: {whs.mean(0)}")
    print(f"anchors (w, h): {np.round(centers, 1).tolist()}")
    print(f"ratios h/w: {np.round(centers[:, 1] / centers[:, 0], 2).tolist()}")
    print(f"scales (sqrt area / stride4): {np.round(np.sqrt(centers.prod(1)) / 4, 2).tolist()}")
    print(f"avg best-anchor IoU: {mean_iou:.3f}")


if __name__ == "__main__":
    main()
