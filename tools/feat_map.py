#!/usr/bin/env python
"""Dump FPN feature maps / pooled feature vectors per image
(reference tools/feat_map.py:23-47 single_gpu_feat).

Two input modes:
- explicit path (file or dir of pngs) → full per-level maps as npz
  (``--vis`` adds mean-activation PNGs);
- no path → the config's test dataset (reference behavior), saving one
  ``<out>/<img_name>.npy`` per image.

``--pooled`` switches the npz maps to the reference's vector format: every
FPN level spatially mean-pooled then concatenated (reference :40-44).
Dataset mode is always pooled (that is all the reference saves).

Usage:
  python tools/feat_map.py <img_or_dir> <config> [ckpt] --out featmaps/
  python tools/feat_map.py --config CFG --checkpoint CKPT --out featmaps/ \
      [--cfg-options data.test.ann_file=...]
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
    ap.add_argument("path", nargs="?", default=None,
                    help="image file or dir; omit to walk the config's test dataset")
    ap.add_argument("config_pos", nargs="?", default=None)
    ap.add_argument("checkpoint_pos", nargs="?", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="featmaps")
    ap.add_argument("--name", default=None,
                    help="subdirectory name under --out (reference --name)")
    ap.add_argument("--pooled", action="store_true",
                    help="save the reference's pooled all-level vector instead "
                    "of full maps")
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="config overrides, key=value with dotted keys")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--vis", action="store_true", help="also save mean-activation PNGs")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config

    # positional (path cfg [ckpt]) or flag (--config/--checkpoint) invocation
    config = args.config or args.config_pos
    checkpoint = args.checkpoint or args.checkpoint_pos
    if config is None and args.path and args.config_pos is None:
        # flag-style: the single positional is actually the config
        config, args.path = args.path, None
    if config is None:
        sys.exit("need a config (positional or --config)")

    cfg = Config.fromfile(config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    engine = init_detector(cfg, checkpoint, batch_size=args.batch_size)
    model, params = engine.model, engine.params
    feat_fn = jax.jit(lambda p, x: model.apply(p, x, method="extract_feats"))
    pool_fn = jax.jit(
        lambda p, x: jnp.concatenate(
            [jnp.mean(f, axis=(1, 2))
             for f in model.apply(p, x, method="extract_feats")], axis=1)
    )

    out_dir = os.path.join(args.out, args.name) if args.name else args.out
    os.makedirs(out_dir, exist_ok=True)

    if args.path is None:
        # dataset mode (reference single_gpu_feat): pooled vector per image
        from nuhtc_tpu.data import build_dataset

        dataset = build_dataset({**cfg.data.test, "test_mode": True})
        for start in range(0, len(dataset), args.batch_size):
            idxs = range(start, min(start + args.batch_size, len(dataset)))
            imgs = [dataset.load_image(i) for i in idxs]
            batch = engine.preprocess(imgs)
            vecs = np.asarray(pool_fn(params, batch))[: len(imgs)]
            for i, vec in zip(idxs, vecs):
                name = os.path.splitext(
                    os.path.basename(dataset.img_info(i)["file_name"]))[0]
                np.save(os.path.join(out_dir, f"{name}.npy"), vec)
            print(f"\r{min(start + args.batch_size, len(dataset))}/{len(dataset)}",
                  end="", flush=True)
        print(f"\npooled features → {out_dir}")
        return

    paths = (
        sorted(glob.glob(os.path.join(args.path, "*.png")))
        if os.path.isdir(args.path)
        else [args.path]
    )
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        batch = engine.preprocess([img])[:1]
        name = os.path.splitext(os.path.basename(p))[0]
        if args.pooled:
            vec = np.asarray(pool_fn(params, batch))[0]
            np.save(os.path.join(out_dir, f"{name}.npy"), vec)
        else:
            feats = feat_fn(params, batch)
            np.savez(
                os.path.join(out_dir, f"{name}_fpn.npz"),
                **{f"level{i}": np.asarray(f[0]) for i, f in enumerate(feats)},
            )
            if args.vis:
                for i, f in enumerate(feats):
                    m = np.asarray(f[0]).mean(-1)
                    m = (255 * (m - m.min()) / max(m.max() - m.min(), 1e-9)).astype(np.uint8)
                    cv2.imwrite(
                        os.path.join(out_dir, f"{name}_level{i}.png"),
                        cv2.applyColorMap(m, cv2.COLORMAP_VIRIDIS),
                    )
        print(f"{name}: saved")


if __name__ == "__main__":
    main()
