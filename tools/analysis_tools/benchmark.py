#!/usr/bin/env python
"""Inference throughput benchmark (reference tools/analysis_tools/benchmark.py:
59-132 measure_inference_speed — img/s over a long loop with 5-iter warmup,
periodic fps prints, repeat averaging), on the TPU.

Timing methodology: dispatches are pipelined and completion is forced by
fetching a scalar checksum at the end (on the axon tunnel,
``block_until_ready`` does not block — see bench.py), so the measured rate is
pure device throughput, matching the reference's synchronize-around-the-loop
discipline without per-step host round-trips.

Usage: python tools/analysis_tools/benchmark.py <config> [checkpoint] \
           [--batch-size 16] [--max-iter 100] [--repeat-num 1] \
           [--log-interval 50] [--dataset] [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def measure_inference_speed(engine, imgs, max_iter, log_interval, warmup=5):
    """One measurement pass → img/s (reference :100-131)."""
    import jax

    batch = imgs[0].shape[0]
    fwd = engine._forward
    paste = engine._paste
    hs = ws = np.zeros((batch,), np.int32)  # unused on pre-normalized inputs

    def run(x):
        det = fwd(engine.params, x, hs, ws)
        if paste is not None:
            det["pasted"] = paste(det)
        return det

    def force(det):
        # scalar fetch forces execution on backends where block_until_ready
        # is a no-op (axon)
        return float(np.asarray(det["scores"]).sum())

    for i in range(warmup):
        force(run(imgs[i % len(imgs)]))

    pure_inf = 0.0
    fps = 0.0
    t0 = time.perf_counter()
    outs = []
    for i in range(max_iter):
        outs.append(run(imgs[i % len(imgs)]))
        if (i + 1) % log_interval == 0 or (i + 1) == max_iter:
            force(outs[-1])  # in-order execution: last done ⇒ all done
            outs.clear()
            pure_inf = time.perf_counter() - t0
            fps = (i + 1) * batch / pure_inf
            print(f"Done image [{(i + 1) * batch:<3}/ {max_iter * batch}], "
                  f"fps: {fps:.1f} img / s, "
                  f"times per image: {1000 / fps:.1f} ms / img", flush=True)
    print(f"Overall fps: {fps:.1f} img / s, "
          f"times per image: {1000 / fps:.1f} ms / img", flush=True)
    return fps


def main():
    ap = argparse.ArgumentParser(description="benchmark a model")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-iter", "--iters", type=int, default=100, dest="max_iter")
    ap.add_argument("--repeat-num", type=int, default=1,
                    help="repeat the measurement and average (reference)")
    ap.add_argument("--log-interval", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--dataset", action="store_true",
                    help="feed real images from the config's test dataset "
                    "instead of random tensors (reference data_loader)")
    ap.add_argument("--cfg-options", nargs="+", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from nuhtc_tpu.apis import init_detector
    from nuhtc_tpu.config import Config

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    engine = init_detector(cfg, args.checkpoint, batch_size=args.batch_size)

    size = engine.input_size
    if args.dataset:
        from nuhtc_tpu.data import build_dataset

        ds = build_dataset({**cfg.data.test, "test_mode": True})
        n = min(len(ds), 4 * args.batch_size)
        tiles = [ds.load_image(i) for i in range(n)]
        imgs = [
            engine.preprocess(tiles[s : s + args.batch_size])
            for s in range(0, n, args.batch_size)
            if len(tiles[s : s + args.batch_size]) == args.batch_size
        ] or [engine.preprocess(tiles[: args.batch_size])]
    else:
        rng = np.random.RandomState(0)
        imgs = [
            jnp.asarray(rng.randn(args.batch_size, size, size, 3).astype(np.float32))
            for _ in range(4)
        ]

    fps_list = [
        measure_inference_speed(engine, imgs, args.max_iter, args.log_interval,
                                args.warmup)
        for _ in range(args.repeat_num)
    ]
    if args.repeat_num > 1:
        mean = float(np.mean(fps_list))
        print(f"Average fps of {args.repeat_num} evaluations: {mean:.1f} img / s, "
              f"times per image: {1000 / mean:.1f} ms / img")


if __name__ == "__main__":
    main()
