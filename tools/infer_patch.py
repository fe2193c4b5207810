#!/usr/bin/env python
"""CSV-listed patch inference → COCO json (reference tools/infer_patch.py).

Usage: python tools/infer_patch.py <csv_with_image_paths> <config> [ckpt] \\
           --out nuclei_coco.json [--img-root DIR]
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
    ap.add_argument("--out", default="nuclei_coco.json")
    ap.add_argument("--img-root", default="")
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    import cv2
    import pandas as pd

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.registry import DATASETS
    from nuhtc_tpu.ops import rle as rle_ops

    df = pd.read_csv(args.csv)
    col = df.columns[0]
    paths = [os.path.join(args.img_root, p) for p in df[col].tolist()]

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)
    classes = DATASETS.get(cfg.get("dataset", "PanNukeCocoDataset")).CLASSES

    images, annotations = [], []
    ann_id = 0
    for start in range(0, len(paths), args.batch_size):
        chunk = paths[start : start + args.batch_size]
        imgs = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in chunk]
        for img_idx, (p, res) in enumerate(zip(chunk, engine.run_batch(imgs)), start):
            h, w = imgs[img_idx - start].shape[:2]
            images.append(dict(id=img_idx, file_name=os.path.basename(p), height=h, width=w))
            for i in range(len(res["scores"])):
                r = rle_ops.encode(res["masks"][i])
                bb = rle_ops.toBbox(r).tolist()
                annotations.append(
                    dict(
                        id=ann_id,
                        image_id=img_idx,
                        category_id=int(res["labels"][i]) + 1,
                        bbox=bb,
                        area=bb[2] * bb[3],
                        score=float(res["scores"][i]),
                        iscrowd=0,
                        segmentation=dict(size=r["size"], counts=r["counts"].decode()),
                    )
                )
                ann_id += 1
        print(f"\r{min(start + args.batch_size, len(paths))}/{len(paths)}", end="", flush=True)
    print()
    cats = [dict(id=i + 1, name=c) for i, c in enumerate(classes)]
    with open(args.out, "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    print(f"{len(annotations)} nuclei → {args.out}")


if __name__ == "__main__":
    main()
