#!/usr/bin/env python
"""Corruption-robustness benchmark (reference tools/analysis_tools/
test_robustness.py): evaluates PQ under image corruptions at increasing
severity. The ``imagecorruptions`` package is absent here — we use the
equivalent cv2/numpy corruptions from the RandCorrupt pipeline op.

Usage: python tools/analysis_tools/test_robustness.py <config> [ckpt] \\
           --corruptions gaussian_noise gaussian_blur jpeg pixelate --limit 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

def _catalog():
    from nuhtc_tpu.data.pipelines import CORRUPTIONS as C

    return C


def corrupt(img: np.ndarray, kind: str, severity: int, seed: int | None = None) -> np.ndarray:
    cat = _catalog()
    if kind == "jpeg":  # legacy alias
        kind = "jpeg_compression"
    if kind not in cat:
        raise ValueError(f"{kind}; available: {sorted(cat)}")
    out = cat[kind](img.astype(np.uint8), severity,
                    np.random.RandomState(0 if seed is None else seed))
    return np.clip(out, 0, 255).astype(np.uint8)


def _expand_corruptions(names):
    """Reference group aliases (test_robustness.py:99-110): 'benchmark'
    (default), 'all', 'noise', 'blur', 'weather', 'digital', 'holdout',
    'None', or explicit corruption names."""
    from nuhtc_tpu.data.pipelines import CORRUPTION_GROUPS, CORRUPTIONS as CAT

    out = []
    for n in names:
        if n == "None":
            continue
        elif n in CORRUPTION_GROUPS:
            out.extend(CORRUPTION_GROUPS[n])
        elif n in CAT or n == "jpeg":
            out.append(n)
        else:
            raise ValueError(f"unknown corruption/group: {n}")
    return list(dict.fromkeys(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--corruptions", nargs="+", default=["benchmark"],
                    help="corruption names or groups: all/benchmark/noise/"
                    "blur/weather/digital/holdout/None (reference)")
    ap.add_argument("--severities", nargs="+", type=int, default=[0, 1, 2, 3, 4, 5],
                    help="0 = clean (reference default 0-5)")
    ap.add_argument("--limit", type=int, default=64)
    ap.add_argument("--summaries", action="store_true",
                    help="print every metric per corruption/severity (reference)")
    ap.add_argument("--show-dir", default=None,
                    help="save corrupted-input overlays here (reference)")
    ap.add_argument("--show-score-thr", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=None,
                    help="seed for the corruption noise draws")
    ap.add_argument("--cfg-options", nargs="+", default=None)
    ap.add_argument("--out", default=None, help="save {distortion: {severity: metrics}} json")
    args = ap.parse_args()
    args.corruptions = _expand_corruptions(args.corruptions)

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.eval.evaluate import evaluate_dataset
    from nuhtc_tpu.ops import rle as rle_ops

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    dataset = build_dataset({**cfg.data.test, "test_mode": True})
    engine = init_detector(cfg, args.checkpoint)
    n = min(args.limit, len(dataset))
    if args.show_dir:
        os.makedirs(args.show_dir, exist_ok=True)

    class _Sliced:
        def __init__(self, ds, k):
            self._ds, self._k = ds, k

        def __len__(self):
            return self._k

        def __getattr__(self, a):
            return getattr(self._ds, a)

    def run_eval(transform):
        results = []
        for s in range(0, n, engine.batch_size):
            imgs = [transform(dataset.load_image(i)) for i in range(s, min(s + engine.batch_size, n))]
            for res in engine.run_batch(imgs):
                bb, sg = [], []
                for c in range(engine.num_classes):
                    sel = res["labels"] == c
                    bb.append(np.concatenate([res["boxes"][sel], res["scores"][sel][:, None]], 1))
                    sg.append([rle_ops.encode(m) for m in res["masks"][sel]])
                results.append((bb, sg))
        return evaluate_dataset(_Sliced(dataset, n), results)

    import json

    base = run_eval(lambda x: x)
    print(f"clean: pq={base['pq']:.4f}")
    # reference layout ({distortion: {severity: metrics}}, severity 0 = clean
    # run — mmdet tools/analysis_tools/test_robustness.py aggregation input)
    all_results = {}
    sevs = [s for s in args.severities if s != 0]
    for kind in args.corruptions:
        all_results[kind] = {0: {k: float(v) for k, v in base.items() if isinstance(v, float)}}
        for sev in sevs:
            if args.show_dir:
                import cv2

                ov = corrupt(dataset.load_image(0), kind, sev, args.seed)
                cv2.imwrite(os.path.join(args.show_dir, f"{kind}_s{sev}.png"),
                            cv2.cvtColor(ov, cv2.COLOR_RGB2BGR))
            m = run_eval(lambda x, k=kind, s=sev: corrupt(x, k, s, args.seed))
            if args.summaries:
                for mk, mv in m.items():
                    if isinstance(mv, float):
                        print(f"  {kind} s{sev} {mk}: {mv:.4f}")
            else:
                print(f"{kind} s{sev}: pq={m['pq']:.4f}")
            all_results[kind][int(sev)] = {
                k: float(v) for k, v in m.items() if isinstance(v, float)
            }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(all_results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
