#!/usr/bin/env python
"""Model FLOPs / parameter count via XLA cost analysis
(reference tools/analysis_tools/get_flops.py + forward_dummy).

Usage: python tools/analysis_tools/get_flops.py <config> [--shape 512]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--shape", type=int, nargs="+", default=[512],
                    help="input H [W] (reference --shape nargs)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size-divisor", type=int, default=32,
                    help="pad input dims up to a multiple (reference)")
    ap.add_argument("--cfg-options", nargs="+", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.models.build import build_detector

    if len(args.shape) == 1:
        h = w = args.shape[0]
    else:
        h, w = args.shape[:2]
    if args.size_divisor > 0:
        d = args.size_divisor
        h, w = (h + d - 1) // d * d, (w + d - 1) // d * d

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    model = build_detector(cfg.model, cfg.model.get("test_cfg"))
    img = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"params: {n_params / 1e6:.2f} M")

    lowered = jax.jit(lambda p, x: model.apply(p, x, method="extract_feats")).lower(params, img)
    cost = lowered.compile().cost_analysis()
    if cost and "flops" in cost:
        print(f"backbone+fpn flops: {cost['flops'] / 1e9:.2f} GFLOPs (batch {args.batch})")
    lowered_full = jax.jit(lambda p, x: model.apply(p, x)).lower(params, img)
    cost_full = lowered_full.compile().cost_analysis()
    if cost_full and "flops" in cost_full:
        print(f"full pipeline flops: {cost_full['flops'] / 1e9:.2f} GFLOPs (batch {args.batch})")


if __name__ == "__main__":
    main()
