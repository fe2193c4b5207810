#!/usr/bin/env python
"""Whole-slide inference (reference tools/infer_wsi.py).

Stage A: tissue segmentation + patch grid (+ optional mask/stitch previews);
Stage B: streamed TPU tile inference → per-nucleus GeoJSON/DSA/COCO/SQLite.

Usage:
  python tools/infer_wsi.py <wsi_dir> <config> [checkpoint] \\
      --patch --seg --stitch --save_dir results --mode qupath
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--step_size", type=int, default=192)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--patch", action="store_true")
    ap.add_argument("--seg", action="store_true")
    ap.add_argument("--stitch", action="store_true")
    ap.add_argument("--no_auto_skip", action="store_true")
    ap.add_argument("--save_dir", default="results")
    ap.add_argument("--mag", type=int, default=40)
    ap.add_argument("--patch_level", type=int, default=0,
                    help="pyramid level to read tiles at (reference --patch_level)")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_workers", type=int, default=2)
    ap.add_argument("--margin", type=int, default=0)
    ap.add_argument("--min_area", type=int, default=10)
    ap.add_argument("--score-thr", type=float, default=0.0, dest="score_thr",
                    help="drop detections below this score before export "
                    "(reference --score-thr; its 0.35 applies to --det overlays "
                    "only — export there is unthresholded, so default 0)")
    ap.add_argument("--slide_ext", default=".svs")
    ap.add_argument("--mode", default="qupath", choices=["qupath", "dsa", "coco", "sql", "all"])
    ap.add_argument("--use_otsu", action="store_true")
    ap.add_argument("--det", action="store_true",
                    help="save per-tile detection-overlay jpgs under "
                    "nuclei/<slide>/infer/ (reference --det)")
    ap.add_argument("--preset", default=None,
                    help="CSV of seg/filter/patch parameter overrides "
                    "(reference --preset: columns sthresh/mthresh/close/use_otsu/"
                    "a_t/a_h/max_n_holes/use_padding; first row applies)")
    ap.add_argument("--process_list", default=None,
                    help="CSV with a slide_id column (+ optional process flag and "
                    "per-slide seg params) restricting/refining the run "
                    "(reference --process_list)")
    ap.add_argument("--shard", default=None, metavar="I/N",
                    help="process slide subset i of n (multi-host scale-out: "
                    "slides are embarrassingly parallel — launch one process "
                    "per host/chip with --shard 0/4 … 3/4; the reference's "
                    "DDP analog for WSI inference)")
    args = ap.parse_args()

    import cv2
    import pandas as pd

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.registry import DATASETS
    from nuhtc_tpu.wsi.slide import open_slide
    from nuhtc_tpu.wsi.tissue import segment_tissue, grid_coords, save_coords_h5, load_coords_h5
    from nuhtc_tpu.wsi.stitch import stitch_coords, vis_tissue_mask
    from nuhtc_tpu.wsi.infer import infer_slide

    for sub in ("patches", "masks", "stitches", "nuclei"):
        os.makedirs(os.path.join(args.save_dir, sub), exist_ok=True)

    cfg = Config.fromfile(args.config)
    # test-time rescale follows magnification: scale_factor = 80 / mag
    scale_factor = 80.0 / args.mag
    classes = DATASETS.get(cfg.get("dataset", "PanNukeCocoDataset")).CLASSES

    # seg/filter/patch params: built-in defaults ← --preset CSV ← per-slide
    # process_list columns (reference precedence, tools/infer_wsi.py:133-159,392-404)
    seg_keys = ("sthresh", "mthresh", "close", "use_otsu", "a_t", "a_h", "max_n_holes")
    base_seg = dict(use_otsu=args.use_otsu)
    base_patch = {}
    if args.preset:
        row = pd.read_csv(args.preset).iloc[0]
        base_seg.update({k: row[k] for k in seg_keys if k in row.index})
        if "use_padding" in row.index:
            base_patch["use_padding"] = bool(row["use_padding"])

    slides = sorted(
        f for f in os.listdir(args.source) if os.path.isfile(os.path.join(args.source, f))
    )
    per_slide: dict = {}
    if args.process_list:
        df = pd.read_csv(args.process_list)
        if "process" in df.columns:
            df = df[df["process"] == 1]
        listed = []
        for _, r in df.iterrows():
            sid = str(r["slide_id"])
            matches = [s for s in slides if s == sid or os.path.splitext(s)[0] == sid]
            for s in matches:
                listed.append(s)
                per_slide[s] = {k: r[k] for k in seg_keys if k in df.columns and not pd.isna(r[k])}
        slides = listed
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        assert 0 <= i < n, args.shard
        slides = slides[i::n]
        print(f"shard {i}/{n}: {len(slides)} slides")
    status_rows = []

    # ---------------- Stage A: seg + patch + stitch ----------------------
    for slide_name in slides:
        slide_id = os.path.splitext(slide_name)[0]
        h5_path = os.path.join(args.save_dir, "patches", slide_id + ".h5")
        row = dict(slide_id=slide_name, status="processed")
        if not args.no_auto_skip and os.path.exists(h5_path):
            row["status"] = "already_exist"
            status_rows.append(row)
            continue
        slide = open_slide(os.path.join(args.source, slide_name))
        t0 = time.time()
        seg_kw = {**base_seg, **per_slide.get(slide_name, {})}
        seg_kw["use_otsu"] = bool(seg_kw.get("use_otsu", False))
        seg = segment_tissue(slide, **seg_kw)
        seg_t = time.time() - t0
        if args.seg:
            vis = vis_tissue_mask(slide, seg)
            cv2.imwrite(
                os.path.join(args.save_dir, "masks", slide_id + ".png"),
                cv2.cvtColor(vis, cv2.COLOR_RGB2BGR),
            )
        t0 = time.time()
        coords = grid_coords(slide, seg, args.patch_size, args.step_size,
                             patch_level=args.patch_level, **base_patch)
        patch_t = time.time() - t0
        if args.patch:
            save_coords_h5(
                h5_path, coords,
                attrs=dict(patch_size=args.patch_size, step_size=args.step_size,
                           patch_level=args.patch_level, name=slide_id),
            )
        stitch_t = 0.0
        if args.stitch and len(coords):
            t0 = time.time()
            mosaic = stitch_coords(slide, coords, args.patch_size)
            cv2.imwrite(
                os.path.join(args.save_dir, "stitches", slide_id + ".jpg"),
                cv2.cvtColor(mosaic, cv2.COLOR_RGB2BGR),
            )
            stitch_t = time.time() - t0
        print(
            f"{slide_id}: {len(coords)} patches "
            f"(seg {seg_t:.1f}s, patch {patch_t:.1f}s, stitch {stitch_t:.1f}s)"
        )
        row.update(n_patches=len(coords), seg_time=seg_t, patch_time=patch_t)
        status_rows.append(row)
    status_csv = "process_list_autogen.csv" if not args.shard else (
        f"process_list_autogen_shard{args.shard.replace('/', '_')}.csv"
    )
    pd.DataFrame(status_rows).to_csv(os.path.join(args.save_dir, status_csv), index=False)

    # ---------------- Stage B: tile inference ---------------------------
    # device-side preprocess + compact label-map transfer: the WSI throughput
    # path (16× less host→device, ~250× less device→host traffic)
    import jax

    on_device = jax.default_backend() != "cpu"
    engine = init_detector(
        cfg, args.checkpoint, batch_size=args.batch_size, scale_factor=scale_factor,
        device_preprocess=on_device, compact_masks=on_device,
        tile_size=args.patch_size,
    )

    for slide_name in slides:
        slide_id = os.path.splitext(slide_name)[0]
        h5_path = os.path.join(args.save_dir, "patches", slide_id + ".h5")
        if not os.path.exists(h5_path):
            print(f"skip {slide_id}: no coord file")
            continue
        nuclei_dir = os.path.join(args.save_dir, "nuclei", slide_id)
        if os.path.exists(os.path.join(nuclei_dir, f"{slide_id}_merged.geojson")):
            print(f"skip {slide_id}: existing results")
            continue
        coords, _ = load_coords_h5(h5_path)
        slide = open_slide(os.path.join(args.source, slide_name))
        stats = infer_slide(
            engine, slide, coords, nuclei_dir, slide_id, classes,
            patch_size=args.patch_size, patch_level=args.patch_level,
            mode=args.mode, margin=args.margin, min_area=args.min_area,
            score_thr=args.score_thr,
            det_dir=os.path.join(nuclei_dir, "infer") if args.det else None,
            num_read_threads=args.num_workers,
        )
        print(f"{slide_id}: {stats}")


if __name__ == "__main__":
    main()
