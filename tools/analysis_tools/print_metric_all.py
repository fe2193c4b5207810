#!/usr/bin/env python
"""Combine the per-suite stat CSVs of an eval directory into one summary row
(reference tools/analysis_tools/print_metric_all.py: reads conic_stats.csv +
tissue_stats.csv, emits format_stats.csv with aji/dice/PQ/mPQ).

Usage: python tools/analysis_tools/print_metric_all.py --path <eval_dir>
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def metric_log(eval_path: str) -> str:
    conic = pd.read_csv(os.path.join(eval_path, "conic_stats.csv"), index_col=0)
    pannuke = pd.read_csv(os.path.join(eval_path, "tissue_stats.csv"), index_col=0)
    conic_d = conic.iloc[0].to_dict()
    pann_d = pannuke.iloc[-1].to_dict()
    df = pd.DataFrame(
        {
            "aji": [conic_d["aji"]],
            "dice": [conic_d["dice"]],
            "PQ": [pann_d["PQ bin"]],
            "mPQ": [pann_d["PQ"]],
        }
    )
    df.to_csv(os.path.join(eval_path, "format_stats.csv"))
    out = df.to_string(index=False)
    print(out)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--path", required=True, help="eval directory with the stat CSVs")
    args = ap.parse_args()
    metric_log(args.path)


if __name__ == "__main__":
    main()
