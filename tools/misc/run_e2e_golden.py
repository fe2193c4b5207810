#!/usr/bin/env python
"""End-to-end regression chain on the synthetic PanNuke dataset.

Runs the full user-facing stack exactly the way the reference README does
(reference README.md:148-200 recipe, tools/test.py + analysis_tools/pannuke/
compute_stats.py + tools/infer_wsi.py + tools/nuclei_merge.py +
tools/wsi_feat_extract.py), each stage as its own CLI subprocess:

  1. make_synthetic_pannuke  -> fold1 (train) + fold3 (test) npy triplets
  2. preprocess_pannuke      -> COCO jsons + RGB/seg tiles
  3. tools/train.py          -> 2 iters, orbax checkpoint (tiny model)
  4. tools/test.py           -> --eval segm, preds_pannuke.npy, metrics json
  5. pannuke/compute_stats   -> bPQ/mPQ json from preds vs GT masks
  6. tools/infer_wsi.py      -> synthetic 512x512 slide (2x2 fold3 mosaic),
                                overlapping tiles, all export modes
  7. tools/nuclei_merge.py   -> boundary-merged geojson
  8. tools/wsi_feat_extract  -> per-nucleus feature CSV

and distills every stage's outputs into one summary dict. The summary is the
regression golden (tests/goldens/e2e_synthetic.json): any silent behavior
drift anywhere in the stack changes it.

Mint/refresh the golden:
  JAX_PLATFORMS=cpu python tools/misc/run_e2e_golden.py \
      --out tests/goldens/e2e_synthetic.json
Verify (what tests/test_e2e_regression.py does, opt-in NUHTC_E2E=1):
  JAX_PLATFORMS=cpu python tools/misc/run_e2e_golden.py --check
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np

CONFIG = os.path.join(REPO, "configs", "nuhtc", "htc_lite_tiny_synthetic.py")
GOLDEN = os.path.join(REPO, "tests", "goldens", "e2e_synthetic.json")


def _run(args, work, timeout=1800):
    """Run a repo CLI in a subprocess on the CPU backend.

    PYTHONPATH is pinned to the repo alone: that drops the axon sitecustomize
    dir from sys.path so a wedged TPU tunnel can never hang the chain (the
    plugin otherwise registers at interpreter startup — CLAUDE.md).
    """
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        NUHTC_SYN_ROOT=work,
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    env.pop("PYTHONSTARTUP", None)
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"{args[0]} failed rc={proc.returncode}:\n{proc.stdout[-4000:]}")
    return proc.stdout


def _round(obj, nd=4):
    if isinstance(obj, dict):
        return {k: _round(v, nd) for k, v in sorted(obj.items())}
    if isinstance(obj, (list, tuple)):
        return [_round(v, nd) for v in obj]
    if isinstance(obj, float):
        if np.isnan(obj):
            return "nan"
        return round(obj, nd)
    return obj


def build_chain(work: str) -> dict:
    os.makedirs(work, exist_ok=True)
    t = lambda *p: os.path.join(work, *p)

    # 1. synthetic data (fixed seeds -> bit-identical tiles every run)
    _run(["tools/misc/make_synthetic_pannuke.py", "--out", t("raw_f1"),
          "--n-tiles", "8", "--seed", "0"], work)
    _run(["tools/misc/make_synthetic_pannuke.py", "--out", t("raw_f3"),
          "--n-tiles", "4", "--seed", "3"], work)

    # 2. PanNuke npy -> COCO layout
    for fold, raw in (("1", "raw_f1"), ("3", "raw_f3")):
        _run(["tools/preprocess_pannuke.py",
              "--images", t(raw, "images.npy"), "--masks", t(raw, "masks.npy"),
              "--types", t(raw, "types.npy"), "--fold", fold,
              "--out-dir", t("datasets", "PanNuke"),
              "--coco-dir", t("coco", "PanNuke")], work)

    # 3. train 2 iters -> orbax checkpoint (covers trainer + save path)
    _run(["tools/train.py", CONFIG, "--work-dir", t("train"),
          "--max-epochs", "1", "--iters-per-epoch", "2", "--seed", "0"], work)
    ckpt = t("train", "checkpoints")
    assert glob.glob(os.path.join(ckpt, "*")), "no checkpoint written"

    # 4. dataset eval -> metric suite + preds_pannuke.npy
    _run(["tools/test.py", CONFIG, ckpt, "--eval", "segm", "--batch-size", "2",
          "--eval-options", "save=True", "format=pannuke",
          f"save_path={t('infer')}", "--out-json", t("metrics.json")], work)
    with open(t("metrics.json")) as f:
        metrics = json.load(f)
    preds_path = glob.glob(t("infer", "*", "preds_pannuke.npy"))
    assert preds_path, "tools/test.py did not save preds_pannuke.npy"
    preds = np.load(preds_path[0])

    # 5. PanNuke PQ CLI on the saved preds vs the raw GT masks
    _run(["tools/analysis_tools/pannuke/compute_stats.py",
          "--true", t("raw_f3", "masks.npy"), "--pred", preds_path[0],
          "--types", t("raw_f3", "types.npy"), "--out", t("pq.json")], work)
    with open(t("pq.json")) as f:
        pq = json.load(f)

    # 6. WSI chain: 2x2 mosaic of the fold3 tiles as a 512^2 "slide"
    import cv2

    imgs = np.load(t("raw_f3", "images.npy"))
    mosaic = np.zeros((512, 512, 3), np.uint8)
    for i in range(4):
        y, x = (i // 2) * 256, (i % 2) * 256
        mosaic[y:y + 256, x:x + 256] = np.clip(imgs[i], 0, 255).astype(np.uint8)
    os.makedirs(t("wsi"), exist_ok=True)
    cv2.imwrite(t("wsi", "slide0.png"), cv2.cvtColor(mosaic, cv2.COLOR_RGB2BGR))

    # mag 80 -> scale_factor 80/mag = 1.0, matching the tiny config; stride
    # 192 < 256 produces overlapping tiles so merge has real work to do
    _run(["tools/infer_wsi.py", t("wsi"), CONFIG, ckpt,
          "--patch", "--seg", "--patch_size", "256", "--step_size", "192",
          "--batch_size", "2", "--num_workers", "1", "--mag", "80",
          "--margin", "8", "--min_area", "4", "--slide_ext", ".png",
          "--mode", "all", "--save_dir", t("wsi_out")], work)
    gj_path = t("wsi_out", "nuclei", "slide0", "slide0.geojson")
    with open(gj_path) as f:
        feats = json.load(f)

    # 7. boundary merge — written where wsi_feat_extract looks first
    merged_path = t("wsi_out", "nuclei", "slide0", "slide0_merged.geojson")
    _run(["tools/nuclei_merge.py", "--geojson", gj_path,
          "--out", merged_path], work)
    with open(merged_path) as f:
        merged = json.load(f)

    # 8. per-nucleus features (consumes the merged geojson)
    _run(["tools/wsi_feat_extract.py", t("wsi"), "--segdir", t("wsi_out"),
          "--mag", "80", "--slide_ext", ".png"], work)
    import pandas as pd

    csvs = glob.glob(t("wsi_out", "nuclei", "slide0", "*_features.csv"))
    assert csvs, "wsi_feat_extract wrote no CSV"
    df = pd.read_csv(csvs[0])

    num_cols = sorted(c for c in df.columns if df[c].dtype.kind in "if")
    summary = {
        "test_metrics": _round(metrics),
        "pannuke_pq": _round(pq),
        "preds": {
            "shape": list(preds.shape),
            "instances_per_class": [
                int(sum(len(np.unique(preds[i, :, :, c])) - 1 for i in range(len(preds))))
                for c in range(5)
            ],
        },
        "wsi": {
            "geojson_features": len(feats),
            "merged_features": len(merged),
            "class_names": sorted({ft["properties"]["classification"]["name"] for ft in feats}),
            "feature_rows": int(len(df)),
            "feature_columns_sha1": hashlib.sha1(
                ",".join(sorted(df.columns)).encode()).hexdigest(),
            "feature_means": _round({c: float(df[c].mean()) for c in num_cols[:12]}, 2),
        },
    }
    return summary


def compare(got: dict, want: dict, path="", rtol=2e-3, atol=1e-4):
    """Structural equality with float tolerance; returns mismatch strings."""
    errs = []
    if isinstance(want, dict):
        if not isinstance(got, dict) or set(got) != set(want):
            errs.append(f"{path}: keys {sorted(got) if isinstance(got, dict) else got} "
                        f"!= {sorted(want)}")
            return errs
        for k in want:
            errs += compare(got[k], want[k], f"{path}.{k}", rtol, atol)
    elif isinstance(want, list):
        if not isinstance(got, list) or len(got) != len(want):
            errs.append(f"{path}: {got} != {want}")
            return errs
        for i, (g, w) in enumerate(zip(got, want)):
            errs += compare(g, w, f"{path}[{i}]", rtol, atol)
    elif isinstance(want, float) or isinstance(got, float):
        if want == "nan" or got == "nan":
            if got != want:
                errs.append(f"{path}: {got} != {want}")
        elif not np.isclose(float(got), float(want), rtol=rtol, atol=atol):
            errs.append(f"{path}: {got} != {want}")
    elif got != want:
        errs.append(f"{path}: {got!r} != {want!r}")
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the summary json here (mint a golden)")
    ap.add_argument("--check", action="store_true", help="compare against the committed golden")
    ap.add_argument("--work", default=None, help="work dir (default: a temp dir)")
    args = ap.parse_args()

    work = args.work or tempfile.mkdtemp(prefix="nuhtc_e2e_")
    print(f"work dir: {work}")
    summary = build_chain(work)
    print(json.dumps(summary, indent=2))

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
        print(f"golden -> {args.out}")
    if args.check:
        with open(GOLDEN) as f:
            want = json.load(f)
        errs = compare(summary, want)
        if errs:
            print("\n".join(["GOLDEN MISMATCH:"] + errs))
            sys.exit(1)
        print("golden check OK")


if __name__ == "__main__":
    main()
