#!/usr/bin/env python
"""Re-evaluate saved predictions against a dataset without re-running the
model (reference tools/analysis_tools/eval_metric.py): takes the pickle/json
of per-image results produced by tools/test.py --out.

Usage: python tools/misc/eval_metric.py <config> <results.pkl>
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("results")
    ap.add_argument("--eval-options", nargs="+", default=None)
    args = ap.parse_args()

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.eval.evaluate import evaluate_dataset

    cfg = Config.fromfile(args.config)
    dataset = build_dataset({**cfg.data.test, "test_mode": True})
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    metrics = evaluate_dataset(dataset, results)
    for k, v in metrics.items():
        if k != "confusion_matrix":
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
