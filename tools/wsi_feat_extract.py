#!/usr/bin/env python
"""Per-nucleus morphometric feature extraction from merged GeoJSON
(reference tools/wsi_feat_extract.py): crop each nucleus from the slide,
compute shape/intensity/texture features, write CSV (and optional SQLite).

Usage: python tools/wsi_feat_extract.py <wsi_dir> --segdir results \\
           [--mag 40] [--sql]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def extract_slide_features(slide_path: str, geojson_path: str, out_csv: str,
                           mag: int = 40, pad: int = 5, sql: bool = False,
                           num_workers: int = 1, bs_size: int = 1024):
    import cv2
    import pandas as pd

    from nuhtc_tpu.wsi.slide import open_slide
    from nuhtc_tpu.wsi.features import nucleus_features
    from nuhtc_tpu.wsi.merge import polygon_of_feature

    slide = open_slide(slide_path)
    with open(geojson_path) as f:
        data = json.load(f)
    feats_json = data["features"] if isinstance(data, dict) else data

    def one(fi_feat):
        fi, feat = fi_feat
        poly = polygon_of_feature(feat)
        x1, y1 = np.floor(poly.min(0)).astype(int) - pad
        x2, y2 = np.ceil(poly.max(0)).astype(int) + pad
        x1, y1 = max(x1, 0), max(y1, 0)
        w, h = x2 - x1, y2 - y1
        if w <= 0 or h <= 0 or w * h > 4_000_000:
            return None
        crop = slide.read_region((int(x1), int(y1)), 0, (int(w), int(h)))
        local = poly - [x1, y1]
        if mag != 40:
            # reference wsi_feat_extract.py:50-55: normalize every crop and
            # its polygon to 40x scale before computing features, so shape/
            # texture columns are magnification-invariant
            ratio = 40.0 / mag
            crop = cv2.resize(
                crop, (int(w * ratio), int(h * ratio)), interpolation=cv2.INTER_LINEAR
            )
            local = local * ratio
        mask = np.zeros(crop.shape[:2], np.uint8)
        cv2.fillPoly(mask, [np.round(local).astype(np.int32)], 1)
        row = nucleus_features(crop, mask, offset=(x1, y1))
        if row is None:
            return None
        props = feat.get("properties", {})
        row["label"] = props.get("label", -1)
        row["class"] = props.get("classification", {}).get("name", "")
        row["score"] = props.get("score", 0.0)
        row["nucleus_id"] = fi
        return row

    rows = []
    if num_workers > 1:
        # region reads are I/O-bound — thread-pool them in bs_size batches
        # (the reference's DataLoader(num_workers)/bs_size analog,
        # tools/wsi_feat_extract.py:191-202); batch order keeps output
        # deterministic
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            items = list(enumerate(feats_json))
            for b0 in range(0, len(items), bs_size):
                rows.extend(
                    r for r in pool.map(one, items[b0 : b0 + bs_size]) if r is not None
                )
    else:
        rows = [r for r in map(one, enumerate(feats_json)) if r is not None]
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    if sql:
        import sqlite3

        conn = sqlite3.connect(os.path.splitext(out_csv)[0] + ".db")
        df.to_sql("nuclei_features", conn, if_exists="replace", index=False)
        conn.close()
    return len(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("--segdir", required=True, help="results dir containing nuclei/<slide>/")
    ap.add_argument("--mag", type=int, default=40)
    ap.add_argument("--sql", action="store_true")
    ap.add_argument("--slide_ext", default=".svs")
    ap.add_argument("--start", type=int, default=0,
                    help="first slide index to process (reference --start)")
    ap.add_argument("--end", type=int, default=None,
                    help="one-past-last slide index (reference --end)")
    ap.add_argument("--reverse", action="store_true",
                    help="process slides in reverse order (reference --reverse)")
    ap.add_argument("--bs_size", type=int, default=1024,
                    help="nuclei per worker batch (reference --bs_size)")
    ap.add_argument("--num_workers", type=int, default=1,
                    help="crop-read threads (reference --num_workers)")
    args = ap.parse_args()

    slides = sorted(
        f for f in os.listdir(args.source) if os.path.isfile(os.path.join(args.source, f))
    )
    slides = slides[args.start : args.end]
    if args.reverse:
        slides = slides[::-1]
    for slide_name in slides:
        slide_id = os.path.splitext(slide_name)[0]
        nd = os.path.join(args.segdir, "nuclei", slide_id)
        gj = os.path.join(nd, f"{slide_id}_merged.geojson")
        if not os.path.exists(gj):
            gj = os.path.join(nd, f"{slide_id}.geojson")
        if not os.path.exists(gj):
            print(f"skip {slide_id}: no geojson")
            continue
        out_csv = os.path.join(nd, f"{slide_id}_features.csv")
        n = extract_slide_features(
            os.path.join(args.source, slide_name), gj, out_csv, args.mag, sql=args.sql,
            num_workers=args.num_workers, bs_size=args.bs_size,
        )
        print(f"{slide_id}: {n} nuclei → {out_csv}")


if __name__ == "__main__":
    main()
