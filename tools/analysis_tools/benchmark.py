#!/usr/bin/env python
"""Inference throughput benchmark (reference tools/analysis_tools/benchmark.py:
101-132 — img/s over a long loop with warmup), on the TPU.

Usage: python tools/analysis_tools/benchmark.py <config> [checkpoint] \\
           [--batch-size 16] [--iters 100] [--with-paste]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config

    cfg = Config.fromfile(args.config)
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)

    rng = np.random.RandomState(0)
    size = engine.input_size
    imgs = [
        jnp.asarray(rng.randn(args.batch_size, size, size, 3).astype(np.float32))
        for _ in range(4)
    ]
    fwd = engine._forward
    paste = engine._paste

    def run(x):
        det = fwd(engine.params, x)
        if paste is not None:
            det["pasted"] = paste(det)
        return det

    for i in range(args.warmup):
        jax.block_until_ready(run(imgs[i % 4]))
    t0 = time.perf_counter()
    out = None
    for i in range(args.iters):
        out = run(imgs[i % 4])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = args.batch_size * args.iters / dt
    print(f"Overall: {ips:.2f} img/s, {1000 * dt / (args.batch_size * args.iters):.2f} ms/img")


if __name__ == "__main__":
    main()
