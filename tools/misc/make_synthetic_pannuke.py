#!/usr/bin/env python
"""Generate a synthetic-but-structured PanNuke-format dataset for exercising
the full train→checkpoint→eval loop without the (non-redistributable) real
release (reference data layout: images.npy (N,256,256,3) RGB,
masks.npy (N,256,256,6) per-class instance maps, types.npy (N,) tissue
strings — reference README.md:148-175).

Tiles imitate H&E statistics: pink-ish stroma background with texture, and
elliptical "nuclei" in 5 classes with darker hematoxylin-like fill, so the
losses/assigners/seesaw counters see realistic instance counts, sizes, and
class imbalance.

Usage:
  python tools/misc/make_synthetic_pannuke.py --out /tmp/pannuke_syn \\
      --n-tiles 64 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_tile(rng: np.random.RandomState, size: int = 256):
    import cv2

    # stroma background: pink with low-frequency texture
    base = np.asarray([232, 201, 212], np.float32)
    img = np.tile(base, (size, size, 1))
    noise = rng.randn(size // 8, size // 8, 3).astype(np.float32) * 10
    img += cv2.resize(noise, (size, size), interpolation=cv2.INTER_LINEAR)

    masks = np.zeros((size, size, 6), np.int32)
    # class imbalance roughly like PanNuke (neoplastic-heavy, dead rare)
    class_p = np.asarray([0.45, 0.2, 0.2, 0.05, 0.1])
    n_nuclei = rng.randint(8, 40)
    inst_ids = np.zeros(5, np.int32)
    occupied = np.zeros((size, size), bool)
    for _ in range(n_nuclei):
        c = rng.choice(5, p=class_p)
        cx, cy = rng.randint(12, size - 12, 2)
        a = rng.randint(4, 14)
        b = max(int(a * rng.uniform(0.6, 1.0)), 3)
        ang = rng.uniform(0, 180)
        m = np.zeros((size, size), np.uint8)
        cv2.ellipse(m, (cx, cy), (a, b), ang, 0, 360, 1, -1)
        m = m.astype(bool) & ~occupied  # nuclei don't overlap
        if m.sum() < 12:
            continue
        occupied |= m
        inst_ids[c] += 1
        masks[:, :, c][m] = inst_ids[c]
        # hematoxylin-like fill: class-tinted dark purple + per-nucleus jitter
        tint = np.asarray(
            [[96, 70, 160], [120, 60, 140], [80, 90, 150], [60, 60, 90], [110, 80, 170]],
            np.float32,
        )[c] + rng.randn(3) * 8
        img[m] = tint + rng.randn(int(m.sum()), 3) * 6
    masks[:, :, 5] = (~occupied).astype(np.int32)  # background channel
    return np.clip(img, 0, 255), masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-tiles", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    tissues = ("Breast", "Colon", "Lung", "Kidney", "Prostate")
    imgs = np.zeros((args.n_tiles, args.size, args.size, 3), np.float64)
    masks = np.zeros((args.n_tiles, args.size, args.size, 6), np.float64)
    types = np.asarray([tissues[rng.randint(len(tissues))] for _ in range(args.n_tiles)])
    for i in range(args.n_tiles):
        im, mk = make_tile(rng, args.size)
        imgs[i] = im
        masks[i] = mk
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "images.npy"), imgs)
    np.save(os.path.join(args.out, "masks.npy"), masks)
    np.save(os.path.join(args.out, "types.npy"), types)
    n_inst = int(sum(len(np.unique(masks[i, :, :, c])) - 1
                     for i in range(args.n_tiles) for c in range(5)))
    print(f"{args.n_tiles} tiles, {n_inst} instances → {args.out}")


if __name__ == "__main__":
    main()
