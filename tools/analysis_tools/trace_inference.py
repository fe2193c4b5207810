#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship inference step and print a
per-op device-time attribution.

The axon trace nests device events (a fusion span contains its constituent
ops and while-loop bodies contain their fusions), so flat summing double
counts: this parser keeps only the TPU "XLA Ops" lane and computes
*self-time* (dur minus children) with an interval stack. The lane union
equals wall step time, so the resulting table is a true decomposition.

Usage: python tools/analysis_tools/trace_inference.py [--batch 16] [--out DIR]
       ... --summarize-only   # re-parse an existing trace
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

N_STEPS = 3


def capture(batch: int, out_dir: str):
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from nuhtc_tpu.models.detector import NuHTC
    from nuhtc_tpu.ops.mask_paste import paste_label_map

    tile, scale = 256, 2.0
    size = int(tile * scale)
    model = NuHTC(num_classes=5, dtype=jnp.bfloat16, scale_factor=scale)
    img0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0, method="init_forward")

    @jax.jit
    def step(params, img):
        det = model.apply(params, img)
        lab = jax.vmap(
            lambda m, b, v: paste_label_map(m, b, v, (tile, tile), threshold=0.5)
        )(det["mask_probs"], det["boxes"], det["valid"])
        return det["boxes"].sum() + det["scores"].sum() + lab.sum()

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
    for _ in range(2):
        float(step(params, img))  # warmup + upload

    jax.profiler.start_trace(out_dir)
    acc = [step(params, img) for _ in range(N_STEPS)]
    _ = float(acc[-1])
    jax.profiler.stop_trace()


def _self_times(events):
    """(name, long_name) -> total self-time us, via an interval stack.

    Events must be the device-op lane; sorted (ts asc, dur desc) so parents
    precede their children."""
    events = sorted(events, key=lambda e: (e["ts"], -e["dur"]))
    out = defaultdict(float)
    meta = {}
    stack = []  # [end_ts, name, dur, child_sum, args]

    def close(entry):
        end, name, dur, child, a = entry
        out[name] += max(0.0, dur - child)
        if a and name not in meta:
            meta[name] = a

    for e in events:
        s, d = e["ts"], e["dur"]
        while stack and s >= stack[-1][0] - 1e-6:
            close(stack.pop())
        if stack:
            stack[-1][3] += d
        stack.append([s + d, e["name"], d, 0.0, e.get("args")])
    while stack:
        close(stack.pop())
    return out, meta


_SHAPE_RE = re.compile(r"=\s*(\([^)]*\)|\S+?)\s+(?:fusion|copy|custom-call|convolution|"
                       r"dot|while|sort|reduce|broadcast|reshape|slice|pad|convert|"
                       r"transpose|bitcast|iota|select|scatter|gather|dynamic)")


def summarize(out_dir: str, top: int = 40):
    paths = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace under {out_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # locate the TPU device pid and its "XLA Ops" tid
    tpu_pids = set()
    ops_lane = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"].get("name", ""):
                tpu_pids.add(e["pid"])
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in tpu_pids and e["args"].get("name") == "XLA Ops"):
            ops_lane = (e["pid"], e["tid"])
    assert ops_lane, "no TPU XLA Ops lane in trace"

    lane = [e for e in events
            if e.get("ph") == "X" and "dur" in e
            and (e["pid"], e.get("tid")) == ops_lane]
    self_us, meta = _self_times(lane)
    total = sum(self_us.values())

    def bucket(name: str) -> str:
        n = name.lower()
        if "window_attention" in n or "custom-call" in n:
            return "pallas/custom"
        if n.startswith("copy") or "transpose" in n or "bitcast" in n:
            return "copy/layout"
        if "while" in n:
            return "while-overhead"
        if "conv" in n and "fusion" not in n:
            return "conv"
        if n.startswith("dot"):
            return "dot"
        if "sort" in n or "topk" in n or "top-k" in n:
            return "sort/topk"
        if "fusion" in n:
            return "fusion"
        return "other"

    buckets = defaultdict(float)
    for k, v in self_us.items():
        buckets[bucket(k)] += v
    print(f"\n== trace {paths[-1]}")
    print(f"total device self-time: {total / 1000 / N_STEPS:.1f} ms/step "
          f"(over {N_STEPS} steps)")
    print("\n-- buckets (ms/step) --")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{k:>16s}: {v / 1000 / N_STEPS:8.2f}")

    print(f"\n-- top {top} individual ops (ms/step) --")
    for k, v in sorted(self_us.items(), key=lambda kv: -kv[1])[:top]:
        a = meta.get(k) or {}
        ln = a.get("long_name") or a.get("tf_op") or ""
        m = _SHAPE_RE.search(ln)
        shape = m.group(1) if m else ln[:60]
        print(f"{v / 1000 / N_STEPS:8.2f}  {k[:44]:44s} {shape[:70]}")

    # cluster by result shape: groups the per-chunk/per-stage clones
    by_shape = defaultdict(float)
    for k, v in self_us.items():
        a = meta.get(k) or {}
        ln = a.get("long_name") or ""
        m = _SHAPE_RE.search(ln)
        key = (bucket(k), m.group(1) if m else k.split(".")[0])
        by_shape[key] += v
    print(f"\n-- top {top} shape clusters (ms/step) --")
    for (b, s), v in sorted(by_shape.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / 1000 / N_STEPS:8.2f}  {b:>14s}  {s[:80]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/nuhtc_trace")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.batch, args.out)
    summarize(args.out, top=args.top)


if __name__ == "__main__":
    main()
