#!/usr/bin/env python
"""Confusion matrix plot from an eval json (reference tools/analysis_tools/
confusion_matrix.py).

Usage: python tools/analysis_tools/confusion_matrix.py metrics.json --classes A B C --out cm.png
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def plot_confusion_matrix(cm, classes, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm, float)
    fig, ax = plt.subplots(figsize=(1 + len(classes), 1 + len(classes)))
    im = ax.imshow(cm, cmap="Blues", vmin=0, vmax=100)
    ax.set_xticks(range(len(classes)))
    ax.set_yticks(range(len(classes)))
    ax.set_xticklabels(classes, rotation=45, ha="right")
    ax.set_yticklabels(classes)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("Ground truth")
    for i in range(len(classes)):
        for j in range(len(classes)):
            ax.text(j, i, f"{cm[i, j]:.0f}", ha="center", va="center",
                    color="white" if cm[i, j] > 50 else "black", fontsize=8)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics_json")
    ap.add_argument("--classes", nargs="+", required=True)
    ap.add_argument("--out", default="confusion_matrix.png")
    args = ap.parse_args()
    with open(args.metrics_json) as f:
        m = json.load(f)
    cm = m["confusion_matrix"]
    classes = list(args.classes) + ["Background"]
    print(f"saved {plot_confusion_matrix(cm, classes, args.out)}")


if __name__ == "__main__":
    main()
