#!/usr/bin/env python
"""Patch inference on a directory of PNG tiles (reference tools/infer.py).

Usage: python tools/infer.py <img_dir> <config> [checkpoint] --out <dir>
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_dir")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--out", "--output", default="demo/imgs_infer", dest="out",
                    help="directory for overlays/jsons (reference --output)")
    ap.add_argument("--device", default=None,
                    help="accepted for reference CLI compatibility; device "
                    "selection is JAX_PLATFORMS on this framework")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--score-thr", type=float, default=0.35)
    ap.add_argument("--save-json", action="store_true", help="dump per-image detections json")
    args = ap.parse_args()

    import cv2

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.utils.visualize import draw_detections
    from nuhtc_tpu.config import Config

    paths = sorted(
        p for ext in ("*.png", "*.jpg", "*.tif") for p in glob.glob(os.path.join(args.img_dir, ext))
    )
    if not paths:
        print(f"no images found in {args.img_dir}")
        return
    os.makedirs(args.out, exist_ok=True)

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)

    palette = None
    ds_name = cfg.get("dataset")
    if ds_name:
        from nuhtc_tpu.registry import DATASETS

        try:
            palette = DATASETS.get(ds_name).PALETTE
        except KeyError:
            pass

    for start in range(0, len(paths), args.batch_size):
        chunk = paths[start : start + args.batch_size]
        imgs = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in chunk]
        results = engine.run_batch(imgs)
        for p, img, res in zip(chunk, imgs, results):
            overlay = draw_detections(img, res["masks"], res["labels"], palette=palette)
            name = os.path.splitext(os.path.basename(p))[0]
            cv2.imwrite(
                os.path.join(args.out, f"{name}_overlay.png"),
                cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR),
            )
            if args.save_json:
                import json

                from nuhtc_tpu.ops import rle as rle_ops

                dets = [
                    dict(
                        bbox=res["boxes"][i].tolist(),
                        score=float(res["scores"][i]),
                        label=int(res["labels"][i]),
                        prob=res["probs"][i].tolist(),
                        segmentation=dict(
                            size=rle_ops.encode(res["masks"][i])["size"],
                            counts=rle_ops.encode(res["masks"][i])["counts"].decode(),
                        ),
                    )
                    for i in range(len(res["scores"]))
                ]
                with open(os.path.join(args.out, f"{name}.json"), "w") as f:
                    json.dump(dets, f)
            print(f"{name}: {len(res['scores'])} nuclei")


if __name__ == "__main__":
    main()
