#!/usr/bin/env python
"""Evaluate metrics from pickled raw results without re-running inference
(reference tools/analysis_tools/eval_metric.py:47-76).

The pkl is the per-image ``(bboxes_per_class, segms_per_class)`` list that
``tools/test.py --out results.pkl`` writes — the same contract the reference's
``mmcv.dump(outputs)`` uses — so a single inference pass can be re-scored
under different eval options (score thresholds, formats, overlays) for free.

Usage:
  python tools/analysis_tools/eval_metric.py <config> results.pkl --eval segm
  python tools/analysis_tools/eval_metric.py <config> results.pkl --format-only \
      --eval-options save_path=infer format=conic
"""

from __future__ import annotations

import argparse
import pickle
import sys


def main():
    ap = argparse.ArgumentParser(description="Evaluate metric of results saved in pkl format")
    ap.add_argument("config")
    ap.add_argument("pkl_results")
    ap.add_argument("--eval", nargs="+", default=None,
                    help="evaluation metrics, e.g. segm (reference --eval)")
    ap.add_argument("--format-only", action="store_true",
                    help="format/convert predictions without evaluating")
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="config overrides, key=value with dotted keys")
    ap.add_argument("--eval-options", nargs="+", default=None,
                    help="kwargs for evaluation, key=value "
                    "(save=1 format=conic save_path=infer overlay=1)")
    args = ap.parse_args()

    if not (args.eval or args.format_only):
        sys.exit("Please specify at least one of --eval / --format-only")
    if args.eval and args.format_only:
        sys.exit("--eval and --format-only cannot be both specified")

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.eval.evaluate import evaluate_dataset

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    dataset = build_dataset({**cfg.data.test, "test_mode": True})

    with open(args.pkl_results, "rb") as f:
        results = pickle.load(f)
    if len(results) != len(dataset):
        print(f"warning: {len(results)} results vs {len(dataset)} images — "
              "evaluating the overlapping prefix")
        results = results[: len(dataset)]

    eval_opts = {}
    for kv in args.eval_options or []:
        k, v = kv.split("=", 1)
        eval_opts[k] = v
    metrics = evaluate_dataset(
        dataset,
        results,
        save=bool(eval_opts.get("save", False)) or args.format_only,
        save_path=eval_opts.get("save_path", "infer"),
        data_format=eval_opts.get("format", "conic"),
        overlay=bool(eval_opts.get("overlay", False)),
        format_only=args.format_only,
    )
    for k, v in metrics.items():
        if k != "confusion_matrix":
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
