#!/usr/bin/env python
"""Render the (augmented) train pipeline output for inspection
(reference tools/misc/browse_dataset.py).

Usage: python tools/misc/browse_dataset.py <config> --out vis/ --num 8 [--no-aug]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--out", default="vis")
    ap.add_argument("--num", type=int, default=8)
    ap.add_argument("--no-aug", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.data.loader import CASDataset, prepare_train_sample
    from nuhtc_tpu.data.pipelines import build_train_pipeline, IMG_NORM
    from nuhtc_tpu.utils.visualize import draw_detections

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.data.train)
    inner = ds.dataset if isinstance(ds, CASDataset) else ds
    pipeline = [] if args.no_aug else build_train_pipeline(cfg.get("train_pipeline", []))
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for k in range(args.num):
        idx = ds.sample_index(rng) if isinstance(ds, CASDataset) else rng.randint(len(inner))
        r = prepare_train_sample(inner, idx, pipeline, rng)
        img = r["img"]
        if img.max() <= 20:  # already normalized — denormalize for display
            img = img * np.asarray(IMG_NORM["std"]) + np.asarray(IMG_NORM["mean"])
        img = np.clip(img, 0, 255).astype(np.uint8)
        vis = draw_detections(
            img, list(r.get("gt_masks", [])), r.get("gt_labels", []),
            boxes=r.get("gt_bboxes"), palette=getattr(inner, "PALETTE", None), draw_boxes=True,
        )
        cv2.imwrite(os.path.join(args.out, f"sample_{k}_{idx}.png"), cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.num} samples to {args.out}")


if __name__ == "__main__":
    main()
