#!/usr/bin/env python
"""PanNuke metric suite: bPQ / mPQ per class and per tissue
(reference tools/analysis_tools/pannuke/compute_stats.py:94-180).

Inputs are PanNuke-layout npy arrays (N, 256, 256, 6): per-class instance
maps in channels 0-4, background in channel 5 — the layout written by
``tools/test.py --eval-options save=True format=pannuke``.

Usage:
  python tools/analysis_tools/pannuke/compute_stats.py \\
      --true masks.npy --pred preds_pannuke.npy [--types types.npy] [--out out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

from nuhtc_tpu.eval.stats import get_fast_pq, remap_label


def binarize(arr6: np.ndarray) -> np.ndarray:
    """(256, 256, 6) per-class instance maps → single instance map."""
    out = np.zeros(arr6.shape[:2], np.int32)
    offset = 0
    for c in range(arr6.shape[2] - 1):
        inst = remap_label(arr6[:, :, c].astype(np.int32))
        m = inst > 0
        out[m] = inst[m] + offset
        offset = out.max()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--true", required=True)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--types", default=None, help="per-image tissue types npy")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    true = np.load(args.true, allow_pickle=True)
    pred = np.load(args.pred, allow_pickle=True)
    assert len(true) == len(pred), (len(true), len(pred))
    n, num_classes = len(true), true[0].shape[2] - 1

    bpq_list = []
    mpq_per_img = np.full((n, num_classes), np.nan)
    for i in range(n):
        t6, p6 = true[i], pred[i]
        [_, _, bpq], _ = get_fast_pq(binarize(t6), binarize(p6))
        has_gt_or_pred = (t6[:, :, :num_classes].sum() + p6[:, :, :num_classes].sum()) > 0
        bpq_list.append(bpq if has_gt_or_pred else np.nan)
        for c in range(num_classes):
            t, p = t6[:, :, c].astype(np.int32), p6[:, :, c].astype(np.int32)
            if t.max() == 0 and p.max() == 0:
                continue  # stays NaN (class absent in both)
            [_, _, pq], _ = get_fast_pq(t, p)
            mpq_per_img[i, c] = pq

    results = {
        "bPQ": float(np.nanmean(bpq_list)),
        "mPQ": float(np.nanmean(np.nanmean(mpq_per_img, axis=0))),
    }
    for c in range(num_classes):
        results[f"PQ_class_{c}"] = float(np.nanmean(mpq_per_img[:, c]))

    if args.types:
        types = np.load(args.types, allow_pickle=True)
        for tt in sorted(set(types.tolist())):
            sel = np.asarray([t == tt for t in types])
            results[f"bPQ_{tt}"] = float(np.nanmean(np.asarray(bpq_list)[sel]))
            results[f"mPQ_{tt}"] = float(np.nanmean(np.nanmean(mpq_per_img[sel], axis=0)))

    for k, v in results.items():
        print(f"{k}: {v:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
