#!/usr/bin/env python
"""Deep feature extraction per WSI patch → HDF5 + .npy bags
(reference tools/extract_features_nuhtc.py): runs the backbone+FPN on each
tissue tile and stores one pooled vector per coordinate — the concatenation
of every FPN level's spatial mean (reference model_feat :85-91).

Reference CLI mode (extract_features_nuhtc.py:181-298):
  python tools/extract_features_nuhtc.py --config CFG [--checkpoint CKPT] \
      --data_h5_dir DIR --data_slide_dir DIR --csv_path list.csv \
      --feat_dir OUT [--slide_ext .svs] [--batch_size 256] [--no_auto_skip] \
      [--stain_norm] [--custom_downsample 2] [--target_patch_size 256]
  Walks csv 'slide_id' rows, reads coords from DIR/patches/<slide>.h5 (with
  patch_level/patch_size attrs), writes OUT/h5_files/<slide>.h5
  (features+coords) and OUT/pt_files/<slide>.npy, auto-skipping slides whose
  pt_files bag exists. (.npy holds the same array the reference torch.save's;
  this framework keeps torch out of the serving path.)

Legacy positional mode (earlier rounds):
  python tools/extract_features_nuhtc.py <wsi_dir> <config> [ckpt] --save_dir D
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _build_feat_fn(engine, level=None):
    import jax
    import jax.numpy as jnp

    model = engine.model

    @jax.jit
    def feat_fn(p, x):
        feats = model.apply(p, x, method="extract_feats")
        if level is not None:
            return jnp.mean(feats[level], axis=(1, 2))
        # reference model_feat: every level mean-pooled then concatenated
        return jnp.concatenate([jnp.mean(f, axis=(1, 2)) for f in feats], axis=1)

    return feat_fn


def _slide_features(engine, feat_fn, slide, coords, patch_size, patch_level,
                    batch_size, out_h5, target_patch_size=-1, custom_downsample=1,
                    stain_norm=False):
    """Stream tiles → pooled features, appending to out_h5 per batch
    (reference compute_w_loader :108-172, save_hdf5 mode 'w' then 'a')."""
    import cv2
    import h5py

    from nuhtc_tpu.wsi.infer import tile_stream
    from nuhtc_tpu.wsi.stain import reinhard_normalize

    if target_patch_size > 0:
        resize_to = int(target_patch_size)
    elif custom_downsample > 1:
        resize_to = int(patch_size) // int(custom_downsample)
    else:
        resize_to = None

    params = engine.params
    mode = "w"
    n = 0
    for tiles, bc in tile_stream(slide, coords, int(patch_size),
                                 patch_level=int(patch_level),
                                 batch_size=batch_size):
        proc = []
        for t in tiles:
            if stain_norm:
                t = reinhard_normalize(t)
            if resize_to is not None:
                t = cv2.resize(t, (resize_to, resize_to),
                               interpolation=cv2.INTER_LINEAR)
            proc.append(t)
        batch = engine.preprocess(proc)
        f = np.asarray(feat_fn(params, batch))[: len(tiles)]
        with h5py.File(out_h5, mode) as hf:
            if mode == "w":
                hf.create_dataset("features", data=f, maxshape=(None, f.shape[1]))
                hf.create_dataset("coords", data=np.asarray(bc), maxshape=(None, 2))
            else:
                for k, v in (("features", f), ("coords", np.asarray(bc))):
                    d = hf[k]
                    d.resize(d.shape[0] + len(v), axis=0)
                    d[-len(v):] = v
        mode = "a"
        n += len(tiles)
    return n


def _run_reference_mode(args):
    import pandas as pd

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.wsi.slide import open_slide
    from nuhtc_tpu.wsi.tissue import load_coords_h5

    df = pd.read_csv(args.csv_path)
    os.makedirs(os.path.join(args.feat_dir, "pt_files"), exist_ok=True)
    os.makedirs(os.path.join(args.feat_dir, "h5_files"), exist_ok=True)
    dest = set(os.listdir(os.path.join(args.feat_dir, "pt_files")))

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)
    feat_fn = _build_feat_fn(engine, args.level)

    total = len(df)
    for i, slide_file in enumerate(df["slide_id"]):
        slide_id = str(slide_file).split(args.slide_ext)[0]
        print(f"\nprogress: {i}/{total}\n{slide_id}")
        if not args.no_auto_skip and slide_id + ".npy" in dest:
            print(f"skipped {slide_id}")
            continue
        h5_path = os.path.join(args.data_h5_dir, "patches", slide_id + ".h5")
        slide_path = os.path.join(args.data_slide_dir, slide_id + args.slide_ext)
        out_h5 = os.path.join(args.feat_dir, "h5_files", slide_id + ".h5")
        try:
            coords, attrs = load_coords_h5(h5_path)
            slide = open_slide(slide_path)
            t0 = time.time()
            n = _slide_features(
                engine, feat_fn, slide, coords,
                patch_size=attrs.get("patch_size", args.patch_size),
                patch_level=attrs.get("patch_level", 0),
                batch_size=args.batch_size, out_h5=out_h5,
                target_patch_size=args.target_patch_size,
                custom_downsample=args.custom_downsample,
                stain_norm=args.stain_norm,
            )
            import h5py

            with h5py.File(out_h5, "r") as hf:
                feats = hf["features"][:]
            print(f"computing features for {out_h5} took {time.time() - t0:.1f} s")
            print("features size: ", feats.shape)
            np.save(os.path.join(args.feat_dir, "pt_files", slide_id + ".npy"), feats)
        except Exception as e:  # reference :296-298: log and continue
            print("ERROR:", slide_id)
            print(f"Exception: {e}")


def _run_legacy_mode(args):
    import h5py

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.wsi.slide import open_slide
    from nuhtc_tpu.wsi.tissue import load_coords_h5

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)
    feat_fn = _build_feat_fn(engine, args.level)

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
        coords, attrs = load_coords_h5(h5_path)
        slide = open_slide(os.path.join(args.source, slide_name))
        out = os.path.join(args.save_dir, "features", slide_id + ".h5")
        n = _slide_features(
            engine, feat_fn, slide, coords,
            patch_size=attrs.get("patch_size", args.patch_size),
            patch_level=attrs.get("patch_level", 0),
            batch_size=args.batch_size, out_h5=out,
            stain_norm=args.stain_norm,
        )
        print(f"{slide_id}: {n} patches → {out}")


def main():
    ap = argparse.ArgumentParser(description="Feature Extraction")
    ap.add_argument("source", nargs="?", default=None,
                    help="(legacy mode) directory of slides")
    ap.add_argument("config_pos", nargs="?", default=None,
                    help="(legacy mode) config path")
    ap.add_argument("checkpoint_pos", nargs="?", default=None)
    ap.add_argument("--config", default=None, help="Config file (reference)")
    ap.add_argument("--checkpoint", default=None, help="Checkpoint file (reference)")
    ap.add_argument("--data_h5_dir", default=None,
                    help="dir with patches/<slide>.h5 coords (reference)")
    ap.add_argument("--data_slide_dir", default=None)
    ap.add_argument("--slide_ext", default=".svs")
    ap.add_argument("--csv_path", default=None, help="process list with slide_id column")
    ap.add_argument("--feat_dir", default=None,
                    help="output root: h5_files/ + pt_files/ (reference)")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--no_auto_skip", action="store_true")
    ap.add_argument("--stain_norm", action="store_true",
                    help="Reinhard-normalize tiles before embedding (the "
                    "reference flag is broken upstream — see wsi/stain.py)")
    ap.add_argument("--custom_downsample", type=int, default=1)
    ap.add_argument("--target_patch_size", type=int, default=-1)
    ap.add_argument("--save_dir", default="results", help="(legacy mode)")
    ap.add_argument("--patch_size", type=int, default=256,
                    help="fallback when coords h5 lacks the attr")
    ap.add_argument("--level", type=int, default=None,
                    help="pool a single FPN level instead of the reference's "
                    "all-level concat")
    args = ap.parse_args()

    if args.csv_path is not None:
        if not (args.config and args.data_h5_dir and args.data_slide_dir and args.feat_dir):
            sys.exit("reference mode needs --config --data_h5_dir --data_slide_dir --feat_dir")
        _run_reference_mode(args)
    else:
        if not (args.source and args.config_pos):
            sys.exit("usage: extract_features_nuhtc.py <wsi_dir> <config> [ckpt] "
                     "--save_dir D   (or the reference --csv_path mode)")
        args.config = args.config_pos
        args.checkpoint = args.checkpoint_pos
        _run_legacy_mode(args)


if __name__ == "__main__":
    main()
