#!/usr/bin/env python
"""Plot/summarize training json logs (reference tools/analysis_tools/
analyze_logs.py + analyze_wsi_logs.py): loss curves, per-epoch val metric
curves, lr, throughput. Supports several logs at once with
``{log}_{key}`` legends like the reference.

Usage:
  python tools/analysis_tools/analyze_logs.py plot_curve work_dirs/x/log.json \\
      --keys total s2.loss_mask --out curves.png
  python tools/analysis_tools/analyze_logs.py plot_curve a/log.json b/log.json \\
      --keys bPQ --mode val --out val.png     # one point per epoch (mode=val rows)
  python tools/analysis_tools/analyze_logs.py cal_train_time work_dirs/x/log.json
"""

from __future__ import annotations

import argparse
import json
import os


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
    ap.add_argument("json_logs", nargs="+")
    ap.add_argument("--keys", nargs="+", default=["total"])
    ap.add_argument("--mode", choices=["train", "val"], default="train",
                    help="val: per-epoch metric curves from mode=val rows "
                    "(the reference analyze_wsi_logs plot_curve)")
    ap.add_argument("--legend", nargs="+", default=None)
    ap.add_argument("--title", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    logs = {p: load_log(p) for p in args.json_logs}
    if all(not rows for rows in logs.values()):
        print("empty log(s)")
        return

    if args.task == "cal_train_time":
        import numpy as np

        for path, rows in logs.items():
            if rows and "time" in rows[0]:
                ts = [r["time"] for r in rows]
                print(f"{path}: mean iter time {np.mean(ts):.4f}s, std {np.std(ts):.4f}")
            else:
                eps = [r.get("epoch") for r in rows if "epoch" in r]
                print(f"{path}: {len(rows)} log entries, epochs "
                      f"{min(eps) if eps else '?'}..{max(eps) if eps else '?'}")
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    legends = args.legend or [
        f"{os.path.basename(os.path.dirname(p) or p)}_{k}"
        for p in args.json_logs for k in args.keys
    ]
    li = 0
    for path, rows in logs.items():
        sel = [r for r in rows if r.get("mode", "train") == args.mode]
        for k in args.keys:
            pts = [(r.get("epoch", i), r[k]) for i, r in enumerate(sel) if k in r]
            if not pts:
                print(f"{path}: no '{k}' in mode={args.mode} rows")
                li += 1
                continue
            xs, ys = zip(*pts)
            if args.mode == "val":
                plt.plot(xs, ys, marker="o", label=legends[li % len(legends)])
                plt.xlabel("epoch")
            else:
                plt.plot(range(len(ys)), ys, linewidth=0.8,
                         label=legends[li % len(legends)])
                plt.xlabel("log step")
            li += 1
    plt.legend()
    if args.title:
        plt.title(args.title)
    out = args.out or "curves.png"
    plt.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
