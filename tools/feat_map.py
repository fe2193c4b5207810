#!/usr/bin/env python
"""Dump FPN level feature maps per image (reference tools/feat_map.py).

Usage: python tools/feat_map.py <img_or_dir> <config> [ckpt] --out featmaps/
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
    ap.add_argument("path")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--out", default="featmaps")
    ap.add_argument("--vis", action="store_true", help="also save mean-activation PNGs")
    args = ap.parse_args()

    import cv2
    import jax

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=1)
    model, params = engine.model, engine.params
    feat_fn = jax.jit(lambda p, x: model.apply(p, x, method="extract_feats"))

    paths = (
        sorted(glob.glob(os.path.join(args.path, "*.png")))
        if os.path.isdir(args.path)
        else [args.path]
    )
    os.makedirs(args.out, exist_ok=True)
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        batch = engine.preprocess([img])[:1]
        feats = feat_fn(params, batch)
        name = os.path.splitext(os.path.basename(p))[0]
        np.savez(
            os.path.join(args.out, f"{name}_fpn.npz"),
            **{f"level{i}": np.asarray(f[0]) for i, f in enumerate(feats)},
        )
        if args.vis:
            for i, f in enumerate(feats):
                m = np.asarray(f[0]).mean(-1)
                m = (255 * (m - m.min()) / max(m.max() - m.min(), 1e-9)).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(args.out, f"{name}_level{i}.png"),
                    cv2.applyColorMap(m, cv2.COLORMAP_VIRIDIS),
                )
        print(f"{name}: saved {len(feats)} levels")


if __name__ == "__main__":
    main()
