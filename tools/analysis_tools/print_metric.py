#!/usr/bin/env python
"""Single-run metric pretty-printer — behavior spec:
reference tools/analysis_tools/print_metric.py:1-96.

Reads ``{path}/tissue_stats.csv`` (the per-tissue table written by
pannuke/compute_stats.py in the reference layout: rows = 19 tissues + the
final aggregate row, columns ``PQ`` (=mPQ) and ``PQ bin`` (=bPQ)), prints the
last row's PQ / mPQ and writes ``{path}/format_stats.csv`` (ref :39-58).

With ``--basedir`` (the reference hardcodes its work_dirs root, ref :65-96),
additionally aggregates 3 PanNuke folds ``{exp}1..{exp}3``: per-tissue mean
of mPQ / bPQ across folds plus a std row from the per-fold aggregates, and
the per-class PQ mean over folds from ``class_stats.csv``.

Usage:
  python tools/analysis_tools/print_metric.py --path work_dirs/exp1/ \\
      [--basedir work_dirs [--exp exp]]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def print_single(eval_path: str) -> dict:
    """Ref main() :21-58: last tissue_stats row → format_stats.csv."""
    pannuke_metric = pd.read_csv(os.path.join(eval_path, "tissue_stats.csv"),
                                 index_col=0)
    last = pannuke_metric.iloc[-1].to_dict()
    mpq, pq = last["PQ"], last["PQ bin"]
    df = pd.DataFrame({"PQ": [pq], "mPQ": [mpq]})
    df.to_csv(os.path.join(eval_path, "format_stats.csv"))
    print(df.to_string(index=False))
    return {"PQ": pq, "mPQ": mpq}


def print_folds(basedir: str, exp_name: str) -> None:
    """Ref __main__ :65-96: mean over folds {exp}1..{exp}3 + std row."""
    stats, mpq_li, bpq_li = [], [], []
    for fold in range(1, 4):
        df = pd.read_csv(os.path.join(basedir, f"{exp_name}{fold}", "tissue_stats.csv"))
        df = df.drop(columns=[c for c in df.columns if c.startswith("Unnamed")])
        last = len(df) - 1  # ref hardcodes row 19 (= the aggregate row)
        bpq_li.append(df.loc[last, "PQ bin"])
        mpq_li.append(df.loc[last, "PQ"])
        stats.append(df)
    total = sum(s.loc[:, ["PQ", "PQ bin"]] for s in stats) / 3
    total["Tissue name"] = stats[0]["Tissue name"]
    total = total[["Tissue name", "PQ", "PQ bin"]]
    total.loc[len(total)] = ["std", np.std(mpq_li), np.std(bpq_li)]
    print(total.round(4))

    cls = []
    for fold in range(1, 4):
        df = pd.read_csv(os.path.join(basedir, f"{exp_name}{fold}", "class_stats.csv"))
        df = df.drop(columns=[c for c in df.columns if c.startswith("Unnamed")])
        cls.append(df)
    ctotal = sum(c.loc[:, ["PQ"]] for c in cls) / 3
    ctotal["Class Name"] = cls[0]["Class Name"]
    print(ctotal[["Class Name", "PQ"]].round(3))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--path", required=True, help="eval dir with tissue_stats.csv")
    ap.add_argument("--basedir", default=None,
                    help="work_dirs root for 3-fold aggregation (ref :65)")
    ap.add_argument("--exp", default=None, help="experiment name prefix")
    args = ap.parse_args()

    print_single(args.path)
    if args.basedir:
        exp = args.exp or os.path.basename(os.path.normpath(args.path))[:-1]
        print_folds(args.basedir, exp)


if __name__ == "__main__":
    main()
