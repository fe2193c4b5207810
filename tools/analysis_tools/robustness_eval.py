#!/usr/bin/env python
"""Aggregate corruption-benchmark results into P / mPC / rPC (reference
tools/analysis_tools/robustness_eval.py:40-160 semantics, over this
framework's PQ/AJI/Dice metric suite instead of COCO mAP rows).

Input: the json written by test_robustness.py --out
({distortion: {severity: {metric: value}}}, severity 0 = clean).

- P    = clean performance,
- mPC  = mean over distortions × severities ≥ 1,
- rPC  = mPC / P.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def robustness_summary(results: dict, metrics=None):
    distortions = sorted(results)
    sevs = sorted({int(s) for d in distortions for s in results[d] if int(s) > 0})
    if metrics is None:
        metrics = sorted(results[distortions[0]]["0" if "0" in results[distortions[0]] else 0])
    get = lambda d, s: results[d].get(s, results[d].get(str(s), {}))
    p = np.array([get(distortions[0], 0).get(m, np.nan) for m in metrics])
    corr = np.array(
        [[[get(d, s).get(m, np.nan) for m in metrics] for s in sevs] for d in distortions]
    )
    mpc = np.nanmean(corr, axis=(0, 1))
    with np.errstate(divide="ignore", invalid="ignore"):
        rpc = np.where(p != 0, mpc / p, np.nan)
    return metrics, p, mpc, rpc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("filename", help="json from test_robustness.py --out")
    ap.add_argument("--metrics", nargs="+", default=None,
                    help="subset of metrics (default: all in the file)")
    ap.add_argument("--prints", nargs="+", default=["P", "mPC", "rPC"],
                    choices=["P", "mPC", "rPC"])
    args = ap.parse_args()

    with open(args.filename) as f:
        results = json.load(f)
    metrics, p, mpc, rpc = robustness_summary(results, args.metrics)

    print(f"model: {args.filename}")
    rows = {"P": p, "mPC": mpc, "rPC": rpc}
    titles = {
        "P": "Performance on Clean Data [P]",
        "mPC": "Mean Performance under Corruption [mPC]",
        "rPC": "Relative Performance under Corruption [rPC]",
    }
    for which in args.prints:
        print(titles[which])
        for m, v in zip(metrics, rows[which]):
            if which == "rPC":
                print(f"  {m:10} => {v * 100:0.1f} %")
            else:
                print(f"  {m:10} =  {v:0.4f}")


if __name__ == "__main__":
    main()
