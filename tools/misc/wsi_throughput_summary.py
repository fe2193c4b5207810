#!/usr/bin/env python
"""Summarize WSI processing throughput from process_list_autogen.csv +
per-slide stats (beyond-reference utility; the reference's analyze_wsi_logs
val-curve plotter lives at tools/analysis_tools/analyze_wsi_logs.py).

Usage: python tools/misc/wsi_throughput_summary.py <save_dir>
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    args = ap.parse_args()

    csv = os.path.join(args.save_dir, "process_list_autogen.csv")
    if os.path.exists(csv):
        import pandas as pd

        df = pd.read_csv(csv)
        print(df.to_string(index=False))
        for col in ("seg_time", "patch_time", "n_patches"):
            if col in df:
                print(f"mean {col}: {df[col].mean():.2f}")
    for gj in sorted(glob.glob(os.path.join(args.save_dir, "nuclei", "*", "*.geojson"))):
        if "_point" in gj or "_merged" in gj:
            continue
        with open(gj) as f:
            feats = json.load(f)
        n = len(feats["features"] if isinstance(feats, dict) else feats)
        print(f"{os.path.basename(gj):<40s} {n:>8d} nuclei")


if __name__ == "__main__":
    main()
