#!/usr/bin/env python
"""Dataset evaluation (reference tools/test.py): batched patch inference over
a COCO test split + AJI/PQ/mPQ metric suite.

Usage:
  python tools/test.py <config> [checkpoint] --eval segm \\
      --eval-options save=True format=pannuke save_path=infer overlay=True
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_eval_options(opts):
    out = {}
    for kv in opts or []:
        k, v = kv.split("=", 1)
        if v in ("True", "False"):
            v = v == "True"
        else:
            try:
                v = float(v) if "." in v else int(v)
            except ValueError:
                pass
        out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--eval", nargs="+", default=["segm"])
    ap.add_argument("--eval-options", nargs="+", default=None)
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="config overrides, key=value with dotted keys "
                    "(reference --cfg-options)")
    ap.add_argument("--work-dir", default=None,
                    help="directory for the metrics json/log (reference --work-dir)")
    ap.add_argument("--format-only", action="store_true",
                    help="write converted predictions without evaluating "
                    "(reference --format-only)")
    ap.add_argument("--show-dir", default=None,
                    help="save prediction overlays here (reference --show-dir)")
    ap.add_argument("--show-score-thr", type=float, default=0.3,
                    help="score threshold for drawn instances (reference)")
    ap.add_argument("--batch-size", "--samples_per_gpu", type=int, default=16,
                    dest="batch_size")
    ap.add_argument("--limit", type=int, default=0, help="evaluate only the first N images")
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--out", default=None, help="pickle the raw per-image results")
    ap.add_argument(
        "--launcher", choices=["none", "jax"], default="none",
        help="'jax' = multi-host: jax.distributed.initialize, images strided "
             "across processes, results all-gathered (reference "
             "multi_gpu_test + init_dist, tools/test.py:239)",
    )
    args = ap.parse_args()

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.eval.evaluate import evaluate_dataset
    from nuhtc_tpu.ops import rle as rle_ops

    nproc, pid = 1, 0
    if args.launcher == "jax":
        import jax

        from nuhtc_tpu.parallel.mesh import init_distributed

        nproc = init_distributed()
        pid = jax.process_index()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    dataset = build_dataset({**cfg.data.test, "test_mode": True})
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)

    n = len(dataset) if not args.limit else min(args.limit, len(dataset))
    # interleaved shard, like mmdet's DistributedSampler: process p → p, p+P,…
    my_idxs = list(range(pid, n, nproc))
    results = []
    t0 = time.perf_counter()
    for start in range(0, len(my_idxs), args.batch_size):
        idxs = my_idxs[start : start + args.batch_size]
        imgs = [dataset.load_image(i) for i in idxs]
        for res in engine.run_batch(imgs):
            # convert masks to RLE + reference result tuple contract
            bboxes, segms = [], []
            for c in range(engine.num_classes):
                sel = res["labels"] == c
                bboxes.append(
                    np.concatenate([res["boxes"][sel], res["scores"][sel][:, None]], 1).astype(
                        np.float32
                    )
                )
                segms.append([rle_ops.encode(m) for m in res["masks"][sel]])
            results.append((bboxes, segms))
        done = min(start + args.batch_size, len(my_idxs))
        rate = done / (time.perf_counter() - t0)
        print(f"\r[p{pid}] {done}/{len(my_idxs)} imgs ({rate:.1f} img/s)", end="", flush=True)
    print()

    if nproc > 1:
        from nuhtc_tpu.parallel.mesh import gather_objects, merge_strided_results

        parts = gather_objects(list(zip(my_idxs, results)))
        if pid != 0:
            return  # rank 0 evaluates (reference collect_results → rank 0)
        results = merge_strided_results(parts)

    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        print(f"raw results → {args.out}")

    eval_opts = parse_eval_options(args.eval_options)
    metrics = evaluate_dataset(
        dataset if not args.limit else _SlicedDataset(dataset, n),
        results,
        save=eval_opts.get("save", False) or args.format_only,
        save_path=args.show_dir or eval_opts.get("save_path", "infer"),
        data_format=eval_opts.get("format", "conic"),
        overlay=eval_opts.get("overlay", False) or bool(args.show_dir),
        overlay_score_thr=args.show_score_thr if args.show_dir else 0.0,
        format_only=args.format_only,
    )
    for k, v in metrics.items():
        if k != "confusion_matrix":
            print(f"{k}: {v:.4f}")
    out_json = args.out_json
    if args.work_dir and not out_json:
        os.makedirs(args.work_dir, exist_ok=True)
        out_json = os.path.join(args.work_dir, "eval_metrics.json")
    if out_json and metrics:
        with open(out_json, "w") as f:
            json.dump({k: v for k, v in metrics.items()}, f, indent=2)
        print(f"metrics → {out_json}")


class _SlicedDataset:
    def __init__(self, ds, n):
        self._ds = ds
        self._n = n

    def __len__(self):
        return self._n

    def __getattr__(self, k):
        return getattr(self._ds, k)


if __name__ == "__main__":
    main()
