#!/usr/bin/env python
"""Per-epoch validation-metric curves from training json logs (reference
tools/analysis_tools/analyze_wsi_logs.py:10-57 — the val-curve variant of
analyze_logs). Thin front-end over analyze_logs.py: ``plot_val_curve`` maps
to ``plot_curve --mode val`` (one point per epoch from mode=val rows),
``cal_train_time`` passes through.

Usage:
  python tools/analysis_tools/analyze_wsi_logs.py plot_val_curve \
      work_dirs/x/log.json --keys bPQ mPQ --out val.png
"""

from __future__ import annotations

import sys


def main():
    argv = sys.argv[1:]
    if not argv or argv[0] not in ("plot_val_curve", "cal_train_time"):
        sys.exit("usage: analyze_wsi_logs.py {plot_val_curve,cal_train_time} "
                 "<json_logs...> [--keys ...] [--legend ...] [--title T] [--out F]")
    task = "plot_curve" if argv[0] == "plot_val_curve" else argv[0]
    extra = ["--mode", "val"] if argv[0] == "plot_val_curve" else []
    sys.argv = [sys.argv[0], task, *argv[1:], *extra]

    import analyze_logs  # noqa: E402  (sibling module)

    analyze_logs.main()


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
