#!/usr/bin/env python
"""Per-nucleus features from a COCO prediction json over tiles
(reference tools/nuclei_feat_extract.py — the per-tile variant of
wsi_feat_extract).

Usage: python tools/nuclei_feat_extract.py <coco_json> --img-root imgs/ --out feats.csv
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
    ap.add_argument("coco_json")
    ap.add_argument("--img-root", default="")
    ap.add_argument("--out", default="nuclei_features.csv")
    ap.add_argument("--sql", action="store_true")
    args = ap.parse_args()

    import cv2
    import pandas as pd

    from nuhtc_tpu.ops import rle as rle_ops
    from nuhtc_tpu.wsi.features import nucleus_features

    with open(args.coco_json) as f:
        coco = json.load(f)
    imgs = {im["id"]: im for im in coco["images"]}
    cats = {c["id"]: c.get("name", str(c["id"])) for c in coco.get("categories", [])}

    cache_id, cache_img = None, None
    rows = []
    for ann in coco["annotations"]:
        info = imgs[ann["image_id"]]
        if cache_id != ann["image_id"]:
            p = os.path.join(args.img_root, info["file_name"])
            im = cv2.imread(p)
            cache_img = cv2.cvtColor(im, cv2.COLOR_BGR2RGB) if im is not None else None
            cache_id = ann["image_id"]
        if cache_img is None:
            continue
        mask = rle_ops.decode(ann["segmentation"])
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            continue
        pad = 5
        x1, y1 = max(xs.min() - pad, 0), max(ys.min() - pad, 0)
        x2, y2 = min(xs.max() + pad + 1, mask.shape[1]), min(ys.max() + pad + 1, mask.shape[0])
        row = nucleus_features(cache_img[y1:y2, x1:x2], mask[y1:y2, x1:x2], offset=(x1, y1))
        if row is None:
            continue
        row["image"] = info["file_name"]
        row["category"] = cats.get(ann["category_id"], ann["category_id"])
        row["score"] = ann.get("score", 1.0)
        row["annotation_id"] = ann["id"]
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(args.out, index=False)
    if args.sql:
        import sqlite3

        conn = sqlite3.connect(os.path.splitext(args.out)[0] + ".db")
        df.to_sql("nuclei_features", conn, if_exists="replace", index=False)
        conn.close()
    print(f"{len(rows)} nuclei → {args.out}")


if __name__ == "__main__":
    main()
