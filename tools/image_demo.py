#!/usr/bin/env python
"""Single-image demo (reference demo/image_demo.py): run the detector on one
image (or a glob) and save the overlay + optional JSON.

Usage: python tools/image_demo.py demo/imgs/242.png <config> [ckpt] --output out/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("img", help="image file or glob")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--output", default="demo_out")
    args = ap.parse_args()

    import cv2
    import json
    import numpy as np

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.utils.visualize import draw_detections

    engine = init_detector(args.config, args.checkpoint, batch_size=1)
    os.makedirs(args.output, exist_ok=True)
    paths = sorted(glob.glob(args.img)) or [args.img]
    for p in paths:
        img = cv2.imread(p)[..., ::-1]
        res = engine.run_batch([img])[0]
        keep = res["scores"] >= args.score_thr
        overlay = draw_detections(
            img, [m for m, k in zip(res["masks"], keep) if k],
            list(res["labels"][keep]), scores=list(res["scores"][keep]),
        )
        name = os.path.splitext(os.path.basename(p))[0]
        cv2.imwrite(os.path.join(args.output, f"{name}_demo.png"), overlay[..., ::-1])
        with open(os.path.join(args.output, f"{name}.json"), "w") as f:
            json.dump(
                {
                    "boxes": res["boxes"][keep].tolist(),
                    "scores": res["scores"][keep].tolist(),
                    "labels": res["labels"][keep].tolist(),
                },
                f,
            )
        print(f"{name}: {int(keep.sum())} nuclei ≥ {args.score_thr}")


if __name__ == "__main__":
    main()
