#!/usr/bin/env python
"""Whole-model A/B sweep in ONE process / ONE tunnel session.

bench_sweep.py runs bench.py per row in a subprocess; that is the honest
isolation, but the axon tunnel often refuses NEW connections for many
minutes after a client disconnects (observed repeatedly: a probe succeeds,
the next process connects 20 s later and wedges in the plugin retry loop).
Running every row inside one process sidesteps reconnects entirely: all the
gated perf knobs (NUHTC_SWIN_KERNEL*, NUHTC_COMPONENTS_KERNEL,
NUHTC_MASK_TAIL, NUHTC_FC0_FOLD) are read at TRACE time, so setting
os.environ before constructing a fresh jitted step re-traces the model under
that combo. Timing methodology is identical to bench.py (pipelined dispatch
of 20 device-resident batches, completion forced by fetching one scalar).

Caveat vs bench.py: rows share one live process (device arrays, compiled
executables accumulate). Params and inputs are shared; each row's executable
is dropped after timing. Whole-model numbers agree with bench.py subprocess
rows to <1% (the "default" row is re-run first as the anchor).

Usage: python tools/analysis_tools/bench_ab_oneproc.py [--rows N1 N2 ...]
           [--base KEY=VAL ...]   # env applied to every row (winner stacking)
Appends one JSON line per row to /tmp/bench_ab.jsonl.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np

ROWS = {
    "default": {},
    "components_pallas": {"NUHTC_COMPONENTS_KERNEL": "pallas"},
    "chunk_8": {"NUHTC_ROI_CHUNK": "8"},
    "swin_min_hw_1024": {"NUHTC_SWIN_KERNEL_MIN_HW": "1024"},
    "swin_min_hw_256": {"NUHTC_SWIN_KERNEL_MIN_HW": "256"},
    "mask_tail_d2s": {"NUHTC_MASK_TAIL": "d2s"},
    "band_24": {"NUHTC_ROI_BAND": "24"},
    "band_48": {"NUHTC_ROI_BAND": "48"},
    "batch_24": {"NUHTC_BENCH_BATCH": "24"},
    "batch_32": {"NUHTC_BENCH_BATCH": "32"},
    "swin_attn": {"NUHTC_SWIN_KERNEL": "attn"},
    "swin_xla": {"NUHTC_SWIN_KERNEL": "none"},
    "fc0_unfold": {"NUHTC_FC0_FOLD": "0"},
    "band_16": {"NUHTC_ROI_BAND": "16"},
    "band_20": {"NUHTC_ROI_BAND": "20"},
    "band_28": {"NUHTC_ROI_BAND": "28"},
    "chunk8_band16": {"NUHTC_ROI_CHUNK": "8", "NUHTC_ROI_BAND": "16"},
    "chunk8_band24": {"NUHTC_ROI_CHUNK": "8", "NUHTC_ROI_BAND": "24"},
    # exactness-preserving narrow band: the pessimistic roi mix overflows
    # ~280 rois at band 24 (>128 slots -> silent clipping); 256 slots keep
    # the repair exact there, at the cost of a bigger dense recompute
    "band24_slots256": {"NUHTC_ROI_BAND": "24", "NUHTC_ROI_OVERFLOW": "256"},
    "band28_slots192": {"NUHTC_ROI_BAND": "28", "NUHTC_ROI_OVERFLOW": "192"},
    # chunk geometry around the round-5 default (chunk 16 / band 24): larger
    # chunks cut scan trips + slice duplication but widen the window
    "chunk24_band32": {"NUHTC_ROI_CHUNK": "24", "NUHTC_ROI_BAND": "32"},
    "chunk24_band28": {"NUHTC_ROI_CHUNK": "24", "NUHTC_ROI_BAND": "28"},
    "chunk32_band32": {"NUHTC_ROI_CHUNK": "32", "NUHTC_ROI_BAND": "32"},
    "paste_64": {"NUHTC_PASTE_CHUNK": "64"},
    "paste_256": {"NUHTC_PASTE_CHUNK": "256"},
    "paste_500": {"NUHTC_PASTE_CHUNK": "500"},
    "winners": {"NUHTC_ROI_BAND": "24", "NUHTC_SWIN_KERNEL_MIN_HW": "256",
                "NUHTC_MASK_TAIL": "d2s"},
}


def bench_one(name: str, env_extra: dict, base_env: dict, state: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.models.detector import NuHTC
    from nuhtc_tpu.ops.mask_paste import paste_label_map

    snapshot = dict(os.environ)
    os.environ.update(base_env)
    os.environ.update(env_extra)
    try:
        batch = int(os.environ.get("NUHTC_BENCH_BATCH", "16"))
        # env defaults must mirror the NuHTC dataclass defaults (these are
        # passed explicitly and would otherwise override the model)
        roi_chunk = int(os.environ.get("NUHTC_ROI_CHUNK", "16"))
        roi_band = int(os.environ.get("NUHTC_ROI_BAND", "24"))
        roi_overflow = int(os.environ.get("NUHTC_ROI_OVERFLOW", "128"))
        tile, scale = 256, 2.0
        size = int(tile * scale)
        model = NuHTC(num_classes=5, dtype=jnp.bfloat16, scale_factor=scale,
                      roi_chunk=roi_chunk, roi_band=roi_band,
                      roi_overflow=roi_overflow)

        if "params" not in state:
            img0 = jnp.zeros((batch, size, size, 3), jnp.float32)
            state["params"] = model.init(
                jax.random.PRNGKey(0), img0, method="init_forward"
            )
        params = state["params"]

        imgs = state.get(("imgs", batch))
        if imgs is None:
            rng = np.random.RandomState(0)
            imgs = [
                jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
                for _ in range(4)
            ]
            state[("imgs", batch)] = imgs

        paste_chunk = int(os.environ.get("NUHTC_PASTE_CHUNK", "128"))

        @jax.jit
        def step(params, img):
            det = model.apply(params, img)
            lab = jax.vmap(
                lambda m, b, v: paste_label_map(m, b, v, (tile, tile),
                                                threshold=0.5, chunk=paste_chunk)
            )(det["mask_probs"], det["boxes"], det["valid"])
            return (det["boxes"].sum() + det["scores"].sum() + det["labels"].sum()
                    + det["valid"].sum() + lab.sum())

        t_c = time.time()
        for im in imgs:
            float(step(params, im))
        compile_s = time.time() - t_c

        n_iters = 20
        t0 = time.perf_counter()
        acc = [step(params, imgs[i % len(imgs)]) for i in range(n_iters)]
        _ = float(acc[-1])
        dt = time.perf_counter() - t0
        tps = batch * n_iters / dt

        # drop this row's executable before the next trace
        try:
            step.clear_cache()
        except AttributeError:
            pass
        del step
        gc.collect()
        return {"name": name, "env": {**base_env, **env_extra},
                "value": round(tps, 2), "ms_per_batch": round(1000 * dt / n_iters, 2),
                "batch": batch, "compile_s": round(compile_s, 1)}
    finally:
        os.environ.clear()
        os.environ.update(snapshot)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", nargs="+", default=None,
                    help=f"row names from {list(ROWS)}")
    ap.add_argument("--base", nargs="*", default=[],
                    help="KEY=VAL env applied to every row")
    ap.add_argument("--out", default="/tmp/bench_ab.jsonl")
    args = ap.parse_args()

    names = args.rows or list(ROWS)
    unknown = [n for n in names if n not in ROWS]
    if unknown:
        ap.error(f"unknown rows {unknown}; choose from {list(ROWS)}")
    base_env = dict(kv.split("=", 1) for kv in args.base)

    # bench.py's probe-with-backoff guard: never import jax into this process
    # while the tunnel is wedged (the plugin retry loop would hang us forever)
    sys.path.insert(0, REPO)
    import bench as bench_mod

    if not bench_mod.wait_for_backend(float(os.environ.get("BENCH_MAX_WAIT_S", "7200"))):
        sys.exit("FATAL: tunnel never came up")

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    state: dict = {}
    n_err = 0
    for name in names:
        t0 = time.time()
        try:
            rec = bench_one(name, ROWS[name], base_env, state)
        except Exception as e:  # keep the sweep alive on a single bad row
            rec = {"name": name, "env": {**base_env, **ROWS[name]},
                   "error": f"{type(e).__name__}: {e}"}
            n_err += 1
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{name:>18}: {rec.get('value', 'ERR')} tiles/s "
              f"({rec.get('ms_per_batch', '-')} ms/batch, wall {rec['wall_s']}s)"
              + (f"  ERROR: {rec['error'][:200]}" if "error" in rec else ""),
              flush=True)
    if n_err == len(names):
        sys.exit("FATAL: every row failed")


if __name__ == "__main__":
    main()
