#!/usr/bin/env python
"""Per-nucleus features from COCO prediction jsons over tiles
(reference tools/nuclei_feat_extract.py — the per-tile variant of
wsi_feat_extract).

Two input modes:

- **Directory mode** (the reference CLI, nuclei_feat_extract.py:28-130):
  ``<datadir>`` holds one subdir per slide with ``coco_nuclei.json`` inside
  (the infer_wsi ``--save_coco`` output). Slides are processed sorted
  (``--reverse`` to invert, ``--start/--end`` to slice), images with fewer
  than ``--min_num`` nuclei are excluded, images are resized to
  ``--patch_size`` when their width differs, instances are flattened into a
  single label map with the HIGHER annotation index winning overlaps
  (reference :83-85 ``np.max(mask * id)``) so occluded nuclei drop out, and
  results land in ``<datadir>/nuclei_feat/<slide>/nuclei_feat.csv`` with
  resume/skip-if-done semantics (reference :50-58: done = the existing CSV's
  img_id set with img_objs>=min_num equals the wanted set).

- **Single-json mode** (convenience): point at one COCO json, get one CSV.

Usage:
  python tools/nuclei_feat_extract.py <datadir> [--start I] [--end J] \
      [--min_num 8] [--patch_size 512] [--reverse]
  python tools/nuclei_feat_extract.py preds.json --img-root imgs/ --out feats.csv
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _feat_rows_for_image(rgb, anns, cats, patch_size):
    """Reference :66-100: resize to patch_size, flatten to a label map
    (higher ann index wins overlaps), per-surviving-label crop features."""
    import cv2

    from nuhtc_tpu.ops import rle as rle_ops
    from nuhtc_tpu.wsi.features import nucleus_features

    h, w = rgb.shape[:2]
    if patch_size and w != patch_size:
        rgb = cv2.resize(rgb, (patch_size, patch_size), interpolation=cv2.INTER_LINEAR)
    lab = None
    for i, ann in enumerate(anns):
        m = rle_ops.decode(ann["segmentation"])
        if patch_size and w != patch_size:
            m = cv2.resize(m, (patch_size, patch_size), interpolation=cv2.INTER_NEAREST)
        if lab is None:
            lab = np.zeros(m.shape, np.int32)
        # higher annotation index wins: assign unconditionally in order
        lab[m > 0] = i + 1
    rows = []
    if lab is None:
        return rows
    pad = 5
    for i, ann in enumerate(anns):
        sel = lab == i + 1
        ys, xs = np.nonzero(sel)
        if len(xs) == 0:
            continue  # fully occluded by a later instance (reference Label gap)
        x1, y1 = max(xs.min() - pad, 0), max(ys.min() - pad, 0)
        x2 = min(xs.max() + pad + 1, lab.shape[1])
        y2 = min(ys.max() + pad + 1, lab.shape[0])
        row = nucleus_features(
            rgb[y1:y2, x1:x2], sel[y1:y2, x1:x2].astype(np.uint8), offset=(x1, y1)
        )
        if row is None:
            continue
        row["cell_type"] = cats.get(ann["category_id"], ann["category_id"])
        row["annotation_id"] = ann["id"]
        row["score"] = ann.get("score", 1.0)
        rows.append(row)
    return rows


def _run_dir_mode(args):
    """Reference nuclei_feat_extract.py:28-113."""
    import cv2
    import pandas as pd

    datadir = args.path
    slide_ids = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{datadir}/*")
        if os.path.isdir(p) and os.path.basename(p) not in ("imgs", "nuclei_feat")
    )
    if args.reverse:
        slide_ids = slide_ids[::-1]
    slide_ids = slide_ids[args.start : args.end] if args.end is not None else slide_ids[args.start :]

    for slide_id in slide_ids:
        print(f"\nprocess: {slide_id}")
        coco_path = f"{datadir}/{slide_id}/coco_nuclei.json"
        if not os.path.exists(coco_path):
            print(f"skipped:{slide_id}\n")
            continue
        with open(coco_path) as f:
            coco = json.load(f)
        cats = {c["id"]: c.get("name", str(c["id"])) for c in coco.get("categories", [])}
        imgs = {im["id"]: im for im in coco["images"]}
        by_img = {}
        for ann in coco["annotations"]:
            by_img.setdefault(ann["image_id"], []).append(ann)
        want = [
            iid
            for iid, im in imgs.items()
            if im.get("n_objects", len(by_img.get(iid, []))) >= args.min_num
        ]

        out_csv = f"{datadir}/nuclei_feat/{slide_id}/nuclei_feat.csv"
        feats = None
        if os.path.exists(out_csv):
            feats = pd.read_csv(out_csv, index_col=0)
            done = set(feats.loc[feats["img_objs"] >= args.min_num, "img_id"].values)
            if done == set(want):
                print(f"skipped:{slide_id}\n")
                continue
            want = sorted(set(want) - done)
        else:
            os.makedirs(os.path.dirname(out_csv), exist_ok=True)

        for n, iid in enumerate(want):
            info = imgs[iid]
            # prefer file_name relative to the json (our export layout);
            # fall back to the reference's datadir/imgs/<slide>/ tree
            cand = [
                os.path.join(os.path.dirname(coco_path), info["file_name"]),
                os.path.join(datadir, "imgs", slide_id, info["file_name"]),
            ]
            rgb = None
            for p in cand:
                im = cv2.imread(p)
                if im is not None:
                    rgb = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
                    break
            if rgb is None:
                continue
            anns = by_img.get(iid, [])
            rows = _feat_rows_for_image(rgb, anns, cats, args.patch_size)
            for r in rows:
                r["img_id"] = iid
                r["img_type"] = info.get("type", "")
                r["img_objs"] = len(anns)
                r["file_name"] = info["file_name"]
            add = pd.DataFrame(rows)
            feats = add if feats is None else pd.concat([feats, add], axis=0)
            if (n + 1) % 10000 == 0 or n + 1 == len(want):
                feats.to_csv(out_csv, mode="w")
            print(f"\r{n + 1}/{len(want)}", end="", flush=True)
        if want and feats is not None:
            print(f"\n{len(feats)} nuclei → {out_csv}")


def _run_json_mode(args):
    import cv2
    import pandas as pd

    from nuhtc_tpu.ops import rle as rle_ops
    from nuhtc_tpu.wsi.features import nucleus_features

    with open(args.path) as f:
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="datadir of slide subdirs with coco_nuclei.json "
                    "(reference mode) OR a single COCO json")
    ap.add_argument("--img-root", default="", help="image root (single-json mode)")
    ap.add_argument("--out", default="nuclei_features.csv", help="(single-json mode)")
    ap.add_argument("--sql", action="store_true", help="(single-json mode)")
    ap.add_argument("--start", type=int, default=0, help="slide start index (reference)")
    ap.add_argument("--end", type=int, default=None, help="slide end index (reference)")
    ap.add_argument("--min_num", type=int, default=8,
                    help="exclude images with fewer nuclei (reference)")
    ap.add_argument("--patch_size", type=int, default=512,
                    help="resize images to this size before features (reference)")
    ap.add_argument("--reverse", action="store_true",
                    help="reverse slide order (reference)")
    args = ap.parse_args()

    if os.path.isdir(args.path):
        _run_dir_mode(args)
    else:
        _run_json_mode(args)


if __name__ == "__main__":
    main()
