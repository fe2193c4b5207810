#!/usr/bin/env python
"""CoNIC metric suite: PQ / multi-PQ+ over (N, 256, 256, 2) inst/class maps
(reference tools/analysis_tools/conic/compute_stats.py).

Usage: python tools/analysis_tools/conic/compute_stats.py \\
           --true labels.npy --pred preds_conic.npy [--num-classes 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

from nuhtc_tpu.eval.stats import get_fast_pq, remap_label, tables_from_labelmaps, pq_from_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--true", required=True)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--num-classes", type=int, default=6)
    args = ap.parse_args()

    true = np.load(args.true, allow_pickle=True)
    pred = np.load(args.pred, allow_pickle=True)
    assert len(true) == len(pred)
    n, c = len(true), args.num_classes

    pq_list = []
    totals = np.zeros((c, 4))  # tp, fp, fn, iou_sum
    for i in range(n):
        t_inst, t_cls = true[i][..., 0].astype(np.int32), true[i][..., 1].astype(np.int32)
        p_inst, p_cls = pred[i][..., 0].astype(np.int32), pred[i][..., 1].astype(np.int32)
        [_, _, pq], _ = get_fast_pq(t_inst, p_inst)
        pq_list.append(pq)
        for cls in range(1, c + 1):
            t = remap_label(np.where(t_cls == cls, t_inst, 0))
            p = remap_label(np.where(p_cls == cls, p_inst, 0))
            if t.max() == 0 and p.max() == 0:
                continue
            tables = tables_from_labelmaps(t, p)
            res, pairs = pq_from_tables(*tables)
            tp, fp, fn = len(pairs[0]), len(pairs[3]), len(pairs[2])
            totals[cls - 1] += [tp, fp, fn, res[1] * (tp + 1e-6)]

    mpq_plus = []
    for cls in range(c):
        tp, fp, fn, iou_sum = totals[cls]
        dq = tp / (tp + 0.5 * fp + 0.5 * fn + 1e-6)
        sq = iou_sum / (tp + 1e-6)
        mpq_plus.append(dq * sq)
        print(f"PQ+_class_{cls + 1}: {dq * sq:.4f}")
    print(f"PQ: {np.mean(pq_list):.4f}")
    print(f"mPQ+: {np.mean(mpq_plus):.4f}")


if __name__ == "__main__":
    main()
