#!/usr/bin/env python
"""One-command TPU validation for the gated Pallas kernels + bench sweep.

Round-2 landed two Pallas kernels with interpret-mode parity only (the axon
tunnel was down), so they ship opt-in (ADVICE round-2 #2):
  NUHTC_SWIN_KERNEL=block      fused full Swin block (attn+LN2+MLP, 1 VMEM pass)
  NUHTC_COMPONENTS_KERNEL=pallas  single-pass component box extraction

This script, run ON the real TPU:
 1. compiles + parity-checks both kernels at PRODUCTION shapes
    (Swin stage-0 128x128xC96 and stage-1 64x64xC192 maps, both shift
    variants, vs the XLA path in bf16; component boxes at 512x512/K512 vs
    the XLA row-factored oracle, exact),
 2. runs bench.py under every flag combination and prints a table.

If everything passes and "block"/"pallas" win the bench, flip the defaults
in models/swin.py:238 / ops/components.py:193 and record the numbers in
BASELINE.md.

Usage:  python tools/analysis_tools/validate_tpu_kernels.py [--skip-bench]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np


def check_swin_block_kernel():
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.models.swin import SwinBlock

    assert jax.default_backend() != "cpu", "run on the TPU"
    results = []
    for dim, heads, hw, shift in ((96, 3, 128, False), (96, 3, 128, True),
                                  (192, 6, 64, False), (192, 6, 64, True)):
        rng = np.random.RandomState(dim + shift)
        x = jnp.asarray(rng.randn(1, hw, hw, dim).astype(np.float32))
        blk = SwinBlock(dim=dim, num_heads=heads, window_size=7,
                        shift=shift, dtype=jnp.bfloat16)
        os.environ["NUHTC_SWIN_KERNEL"] = "none"
        # init once on the XLA path; the kernel modes alias the same param
        # tree (holders reuse norm2/ffn names), mode is read at trace time
        params = blk.init(jax.random.PRNGKey(0), x)

        def run(mode):
            os.environ["NUHTC_SWIN_KERNEL"] = mode
            return np.asarray(blk.apply(params, x), np.float32)

        ref = run("none")
        for mode in ("attn", "block"):
            got = run(mode)
            d = np.abs(got - ref)
            scale = np.abs(ref).mean()
            row = dict(kernel=f"swin:{mode}", dim=dim, hw=hw, shift=shift,
                       max_abs=float(d.max()), mean_abs=float(d.mean()),
                       ref_scale=float(scale))
            ok = d.max() <= 0.1 * scale + 0.05  # bf16 re-fusion tolerance
            row["ok"] = bool(ok)
            results.append(row)
            print(row, flush=True)
    return results


def check_components_kernel():
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.ops import components as C

    rng = np.random.RandomState(0)
    mask8 = np.zeros((512, 512), np.uint8)
    import cv2

    for _ in range(200):
        cx, cy, r = rng.randint(10, 500), rng.randint(10, 500), rng.randint(3, 14)
        cv2.circle(mask8, (cx, cy), r, 1, -1)
    mask = (mask8 > 0) | (rng.rand(512, 512) > 0.995)

    results = []

    logits = jnp.asarray(mask, jnp.float32) * 2 - 1  # fg>0, bg<0

    def boxes(mode):
        os.environ["NUHTC_COMPONENTS_KERNEL"] = mode
        b5, valid = C.component_proposals(logits, (512, 512), max_components=512)
        return np.asarray(b5), np.asarray(valid)

    bx, vx = boxes("xla")
    bp, vp = boxes("pallas")
    same = bool(np.array_equal(vx, vp) and np.array_equal(bx[vx], bp[vp]))
    row = dict(kernel="components:pallas", exact_match=same,
               n_boxes=int(vx.sum()))
    row["ok"] = same
    results.append(row)
    print(row, flush=True)

    # batch-grid kernel at production batch shape (ONE pallas_call over the
    # whole batch — the round-4 fix for vmap serialization) vs the vmapped
    # XLA path, exact
    b = 8
    logits_b = []
    for i in range(b):
        m8 = np.zeros((512, 512), np.uint8)
        r2 = np.random.RandomState(100 + i)
        for _ in range(150):
            cx, cy, r = r2.randint(10, 500), r2.randint(10, 500), r2.randint(3, 14)
            cv2.circle(m8, (cx, cy), r, 1, -1)
        logits_b.append((m8 > 0).astype(np.float32) * 2 - 1)
    logits_b = jnp.asarray(np.stack(logits_b))

    def boxes_b(mode):
        os.environ["NUHTC_COMPONENTS_KERNEL"] = mode
        b5, valid = C.component_proposals_batched(
            logits_b, (512, 512), max_components=512)
        return np.asarray(b5), np.asarray(valid)

    bxb, vxb = boxes_b("xla")
    bpb, vpb = boxes_b("pallas")
    same_b = bool(np.array_equal(vxb, vpb) and np.array_equal(bxb[vxb], bpb[vpb]))
    row = dict(kernel="components:pallas_batched", batch=b, exact_match=same_b,
               n_boxes=int(vxb.sum()))
    row["ok"] = same_b
    results.append(row)
    print(row, flush=True)
    return results


def bench_sweep():
    rows = []
    for swin in ("attn", "block"):
        for comp in ("xla", "pallas"):
            env = dict(os.environ,
                       NUHTC_SWIN_KERNEL=swin, NUHTC_COMPONENTS_KERNEL=comp,
                       BENCH_MAX_WAIT_S="300")
            r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                               env=env, capture_output=True, text=True, timeout=3600)
            line = next((l for l in r.stdout.splitlines() if l.startswith("{")), None)
            val = json.loads(line)["value"] if line else None
            rows.append((swin, comp, val, r.returncode))
            print(f"bench swin={swin} comp={comp}: {val} tiles/s (rc={r.returncode})",
                  flush=True)
    print("\n| swin | components | tiles/s |")
    print("|---|---|---|")
    for swin, comp, val, rc in rows:
        print(f"| {swin} | {comp} | {val if rc == 0 else 'FAILED'} |")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    all_ok = True
    if not args.skip_parity:
        for row in check_swin_block_kernel() + check_components_kernel():
            all_ok &= row["ok"]
        print("PARITY", "OK" if all_ok else "FAILED", flush=True)
    if not args.skip_bench:
        bench_sweep()
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
