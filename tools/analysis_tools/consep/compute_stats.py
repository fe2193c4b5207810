#!/usr/bin/env python
"""CoNSeP metric suite over .mat instance/type maps
(reference tools/analysis_tools/consep/compute_stats.py): binary PQ/AJI/Dice
plus per-type detection/classification F1 via centroid pairing.

Usage: python tools/analysis_tools/consep/compute_stats.py \\
           --true-dir Labels/ --pred-dir infer/CoNSePCocoDataset/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np
from scipy import io as sio
from scipy import ndimage as ndi

from nuhtc_tpu.eval.stats import (
    get_fast_pq,
    get_fast_aji,
    get_dice_1,
    pair_coordinates,
    remap_label,
)


def centroids_types(inst_map, type_map):
    ids = np.unique(inst_map)
    ids = ids[ids != 0]
    cents, types = [], []
    for i in ids:
        m = inst_map == i
        cy, cx = ndi.center_of_mass(m)
        cents.append([cx, cy])
        vals, counts = np.unique(type_map[m], return_counts=True)
        types.append(int(vals[np.argmax(counts)]))
    return np.asarray(cents).reshape(-1, 2), np.asarray(types)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--true-dir", required=True)
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--radius", type=float, default=12.0)
    args = ap.parse_args()

    pq_l, aji_l, dice_l = [], [], []
    tp_d = fp_d = fn_d = 0
    type_stats = {}
    for tpath in sorted(glob.glob(os.path.join(args.true_dir, "*.mat"))):
        name = os.path.splitext(os.path.basename(tpath))[0]
        ppath = os.path.join(args.pred_dir, name + ".mat")
        if not os.path.exists(ppath):
            continue
        t = sio.loadmat(tpath)
        p = sio.loadmat(ppath)
        t_inst = remap_label(t["inst_map"].astype(np.int32))
        p_inst = remap_label(p["inst_map"].astype(np.int32))
        t_type = t.get("type_map", t.get("inst_type", np.zeros_like(t_inst)))
        p_type = p.get("inst_type", np.zeros_like(p_inst))
        if t_type.shape != t_inst.shape:  # per-instance vector form
            tm = np.zeros_like(t_inst)
            for i, v in enumerate(np.ravel(t_type), 1):
                tm[t_inst == i] = v
            t_type = tm

        [_, _, pq], _ = get_fast_pq(t_inst, p_inst)
        pq_l.append(pq)
        aji_l.append(get_fast_aji(t_inst, p_inst))
        dice_l.append(get_dice_1(t_inst, p_inst))

        tc, tt = centroids_types(t_inst, t_type)
        pc, pt = centroids_types(p_inst, p_type)
        pairing, ua, ub = pair_coordinates(tc, pc, args.radius)
        tp_d += len(pairing)
        fn_d += len(ua)
        fp_d += len(ub)
        for cls in np.unique(np.concatenate([tt, pt]) if len(tt) + len(pt) else []):
            s = type_stats.setdefault(int(cls), [0, 0, 0])  # tp, fp, fn
            for a, b in pairing:
                if tt[a] == cls and pt[b] == cls:
                    s[0] += 1
                elif pt[b] == cls and tt[a] != cls:
                    s[1] += 1
                elif tt[a] == cls and pt[b] != cls:
                    s[2] += 1
            s[1] += int((pt[ub] == cls).sum()) if len(ub) else 0
            s[2] += int((tt[ua] == cls).sum()) if len(ua) else 0

    f1_d = 2 * tp_d / max(2 * tp_d + fp_d + fn_d, 1)
    print(f"PQ: {np.mean(pq_l):.4f}  AJI: {np.mean(aji_l):.4f}  Dice: {np.mean(dice_l):.4f}")
    print(f"Detection F1: {f1_d:.4f}")
    for cls, (tp, fp, fn) in sorted(type_stats.items()):
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        print(f"F1_type_{cls}: {f1:.4f}")


if __name__ == "__main__":
    main()
