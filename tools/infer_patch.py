#!/usr/bin/env python
"""CSV-listed patch inference → COCO json (reference tools/infer_patch.py).

Usage: python tools/infer_patch.py <csv_with_image_paths> <config> [ckpt] \\
           --out nuclei_coco.json [--img-root DIR] [--vis-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--out", "--output", default="nuclei_coco.json", dest="out")
    ap.add_argument("--img-root", default="")
    ap.add_argument("--image-col", default=None,
                    help="CSV column holding image paths (reference --image-col; "
                    "default: 'image_path' if present, else the first column)")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--score-thr", type=float, default=0.35,
                    help="score threshold for detections (reference default 0.35)")
    ap.add_argument("--mask-nms-thr", type=float, default=0.05,
                    help="IoU threshold for mask NMS; 0 disables (reference)")
    ap.add_argument("--mag", type=int, default=40,
                    help="input magnification; test rescale = 80/mag (reference)")
    ap.add_argument("--num-workers", type=int, default=8,
                    help="image-read threads (reference --num-workers)")
    ap.add_argument("--vis-dir", default=None,
                    help="save overlay images for the first --vis-samples "
                    "images (reference --vis-dir)")
    ap.add_argument("--vis-samples", type=int, default=10)
    args = ap.parse_args()

    import cv2
    import pandas as pd

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.registry import DATASETS
    from nuhtc_tpu.ops import rle as rle_ops
    from nuhtc_tpu.eval.evaluate import mask_nms

    df = pd.read_csv(args.csv)
    col = args.image_col or ("image_path" if "image_path" in df.columns else df.columns[0])
    if col not in df.columns:
        raise ValueError(f"CSV must contain '{col}' column")
    paths = [os.path.join(args.img_root, p) for p in df[col].tolist()]

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size,
                           scale_factor=80.0 / args.mag)
    classes = DATASETS.get(cfg.get("dataset", "PanNukeCocoDataset")).CLASSES

    def read(p):
        im = cv2.imread(p)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB) if im is not None else None

    if args.vis_dir:
        os.makedirs(args.vis_dir, exist_ok=True)
    vis_count = 0

    images, annotations = [], []
    ann_id = 0
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(args.num_workers, 1)) as pool:
        for start in range(0, len(paths), args.batch_size):
            chunk = paths[start : start + args.batch_size]
            imgs = list(pool.map(read, chunk))
            keep = [i for i, im in enumerate(imgs) if im is not None]
            for img_idx, res in zip(
                (start + i for i in keep), engine.run_batch([imgs[i] for i in keep])
            ):
                im = imgs[img_idx - start]
                h, w = im.shape[:2]
                p = paths[img_idx]
                images.append(dict(id=img_idx, file_name=os.path.basename(p), height=h, width=w))
                sel = res["scores"] >= args.score_thr
                masks = res["masks"][sel]
                labels, scores = res["labels"][sel], res["scores"][sel]
                rles = [rle_ops.encode(m) for m in masks]
                if args.mask_nms_thr > 0 and rles:
                    rles, keep_idx = mask_nms(rles, scores, thr=args.mask_nms_thr)
                    masks = masks[keep_idx]
                    labels, scores = labels[keep_idx], scores[keep_idx]
                for i, r in enumerate(rles):
                    bb = rle_ops.toBbox(r).tolist()
                    annotations.append(
                        dict(
                            id=ann_id,
                            image_id=img_idx,
                            category_id=int(labels[i]) + 1,
                            bbox=bb,
                            area=bb[2] * bb[3],
                            score=float(scores[i]),
                            iscrowd=0,
                            segmentation=dict(size=r["size"], counts=r["counts"].decode()),
                        )
                    )
                    ann_id += 1
                if args.vis_dir and vis_count < args.vis_samples:
                    from nuhtc_tpu.utils.visualize import draw_detections

                    ov = draw_detections(im, masks, labels, scores)
                    cv2.imwrite(
                        os.path.join(args.vis_dir, f"{vis_count:04d}_{os.path.basename(p)}"),
                        cv2.cvtColor(ov, cv2.COLOR_RGB2BGR),
                    )
                    vis_count += 1
            print(f"\r{min(start + args.batch_size, len(paths))}/{len(paths)}", end="", flush=True)
    print()
    cats = [dict(id=i + 1, name=c) for i, c in enumerate(classes)]
    with open(args.out, "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    print(f"{len(annotations)} nuclei → {args.out}")


if __name__ == "__main__":
    main()
