#!/usr/bin/env python
"""Pretty-print a metrics json from tools/test.py (reference tools/
print_metric*.py).

Usage: python tools/misc/print_metric.py metrics.json [--classes A B C]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics_json")
    ap.add_argument("--classes", nargs="+", default=None)
    args = ap.parse_args()
    with open(args.metrics_json) as f:
        m = json.load(f)

    order = ["aji", "aji_plus", "dq", "sq", "pq", "dice", "precision", "recall",
             "multi_pq", "multi_pq+"]
    print(f"{'metric':<16s} value")
    print("-" * 26)
    for k in order:
        if k in m:
            print(f"{k:<16s} {m[k]:.4f}")
    per_class = sorted(k for k in m if k.startswith("multi_pq_") or k.startswith("multi_pq+_"))
    for k in per_class:
        idx = int(k.rsplit("_", 1)[1])
        name = args.classes[idx] if args.classes and idx < len(args.classes) else str(idx)
        print(f"{k.rsplit('_', 1)[0]}[{name}]".ljust(24) + f" {m[k]:.4f}")


if __name__ == "__main__":
    main()
