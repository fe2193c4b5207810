#!/usr/bin/env python
"""Plot/summarize training json logs (reference tools/analysis_tools/
analyze_logs.py): loss curves, lr, throughput.

Usage: python tools/analysis_tools/analyze_logs.py plot_curve work_dirs/x/log.json \\
           --keys total s2.loss_mask --out curves.png
       python tools/analysis_tools/analyze_logs.py cal_train_time work_dirs/x/log.json
"""

from __future__ import annotations

import argparse
import json
import sys


def load_log(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["plot_curve", "cal_train_time"])
    ap.add_argument("json_log")
    ap.add_argument("--keys", nargs="+", default=["total"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = load_log(args.json_log)
    if not rows:
        print("empty log")
        return

    if args.task == "cal_train_time":
        import numpy as np

        if "time" in rows[0]:
            ts = [r["time"] for r in rows]
            print(f"mean iter time: {np.mean(ts):.4f}s, std {np.std(ts):.4f}")
        else:
            print(f"{len(rows)} log entries, epochs {rows[0].get('epoch')}..{rows[-1].get('epoch')}")
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = list(range(len(rows)))
    for k in args.keys:
        ys = [r.get(k) for r in rows]
        plt.plot(xs, ys, label=k)
    plt.xlabel("log step")
    plt.legend()
    out = args.out or "curves.png"
    plt.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
