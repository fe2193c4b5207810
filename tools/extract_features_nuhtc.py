#!/usr/bin/env python
"""Deep feature extraction per WSI patch → HDF5
(reference tools/extract_features_nuhtc.py): runs the backbone+FPN on each
tissue tile and stores a pooled feature vector per coordinate.

Usage: python tools/extract_features_nuhtc.py <wsi_dir> <config> [ckpt] \\
           --save_dir results [--level 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--save_dir", default="results")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--level", type=int, default=3, help="FPN level to pool (coarsest=3)")
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.wsi.slide import open_slide
    from nuhtc_tpu.wsi.tissue import load_coords_h5
    from nuhtc_tpu.wsi.infer import tile_stream

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)
    model, params = engine.model, engine.params

    @jax.jit
    def feat_fn(p, x):
        feats = model.apply(p, x, method="extract_feats")
        return jnp.mean(feats[args.level], axis=(1, 2))  # (B, C) pooled

    os.makedirs(os.path.join(args.save_dir, "features"), exist_ok=True)
    slides = sorted(
        f for f in os.listdir(args.source) if os.path.isfile(os.path.join(args.source, f))
    )
    for slide_name in slides:
        slide_id = os.path.splitext(slide_name)[0]
        h5_path = os.path.join(args.save_dir, "patches", slide_id + ".h5")
        if not os.path.exists(h5_path):
            print(f"skip {slide_id}: no coords")
            continue
        coords, _ = load_coords_h5(h5_path)
        slide = open_slide(os.path.join(args.source, slide_name))
        feats_all, coords_all = [], []
        for tiles, bc in tile_stream(slide, coords, args.patch_size, batch_size=args.batch_size):
            batch = engine.preprocess(tiles)
            f = np.asarray(feat_fn(params, batch))[: len(tiles)]
            feats_all.append(f)
            coords_all.append(bc)
        out = os.path.join(args.save_dir, "features", slide_id + ".h5")
        with h5py.File(out, "w") as f:
            f.create_dataset("features", data=np.concatenate(feats_all))
            f.create_dataset("coords", data=np.concatenate(coords_all))
        print(f"{slide_id}: {len(coords)} patches → {out}")


if __name__ == "__main__":
    main()
