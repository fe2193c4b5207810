#!/usr/bin/env python
"""Whole-model bench A/B sweep over the gated perf knobs (runs bench.py as a
subprocess per config — BASELINE.md round-4 lesson: isolated op probes
mispredicted the in-model winner three times; only whole-model numbers set
defaults).

Each row is one bench.py run on the real TPU with a different env combo.
Results print as a table and append to /tmp/bench_sweep.jsonl.

Usage:  python tools/analysis_tools/bench_sweep.py [--only NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

# name -> env overrides (on top of current defaults)
SWEEPS = {
    "default": {},
    # Swin full-block kernel at stage 2 (32x32) and stages 2+3 (16x16):
    # the round-3 cutoff (64x64) predates the full-block kernel whose
    # economics fold the LN2/MLP HBM round-trips as well
    "swin_min_hw_1024": {"NUHTC_SWIN_KERNEL_MIN_HW": "1024"},
    "swin_min_hw_256": {"NUHTC_SWIN_KERNEL_MIN_HW": "256"},
    # band width around the 32 default
    "band_24": {"NUHTC_ROI_BAND": "24"},
    "band_48": {"NUHTC_ROI_BAND": "48"},
    # roi chunk: 16 won at round-4 defaults; re-test 8 at the current ones
    "chunk_8": {"NUHTC_ROI_CHUNK": "8"},
    # batch-grid components kernel (ONE pallas_call for the whole batch —
    # the round-4 per-image kernel lost to vmap serialization)
    "components_pallas": {"NUHTC_COMPONENTS_KERNEL": "pallas"},
    # batch size (B32 lost at round-1 state; the model is leaner now)
    "batch_24": {"NUHTC_BENCH_BATCH": "24"},
    "batch_32": {"NUHTC_BENCH_BATCH": "32"},
    # fused depth-to-space mask tail: deconv→ReLU→1×1 logits as one matmul
    # + in-fusion logits contraction — the (R,28,28,C') activation never
    # reaches HBM (models/mask_head.py, tests/test_mask_tail.py)
    "mask_tail_d2s": {"NUHTC_MASK_TAIL": "d2s"},
}


def tunnel_ready(timeout: float = 150.0) -> bool:
    """Cheap tunnel-health probe: a tiny matmul in a fresh process. The axon
    plugin blocks in a nanosleep retry loop when the tunnel endpoint is down
    (it flaps — see CLAUDE.md), so a bounded probe is the only reliable
    health signal."""
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")
    try:
        p = subprocess.run(
            [sys.executable, "-c", probe], timeout=timeout,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_tunnel(max_wait_s: float = 7200.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if tunnel_ready():
            return True
        print(f"[sweep] tunnel down, waiting ({int(time.time() - t0)}s)...",
              flush=True)
        time.sleep(60)
    return False


def run_one(name: str, env_extra: dict, timeout: float = 2400.0):
    env = dict(os.environ)
    # keep the parent's PYTHONPATH entries (e.g. /root/.axon_site, which
    # registers the axon TPU plugin) — replacing it wholesale makes
    # JAX_PLATFORMS=axon unresolvable in the child bench.py
    parent_pp = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + parent_pp if parent_pp else "")
    if name != "default":
        env["BENCH_WSI"] = "0"  # A/B rows only need the patch number
    env.update(env_extra)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
    except subprocess.TimeoutExpired as e:
        # one stalled row (tunnel wedge / cold compile) must not kill the
        # sweep — record it and move on
        rec = {"name": name, "env": env_extra,
               "wall_s": round(time.time() - t0, 1),
               "error": f"timeout after {timeout}s: {(e.stdout or '')[-500:]}"}
        with open("/tmp/bench_sweep.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            line = ln
    rec = {"name": name, "env": env_extra, "wall_s": round(time.time() - t0, 1)}
    if proc.returncode != 0 or line is None:
        rec["error"] = proc.stdout[-1500:]
    else:
        rec.update(json.loads(line))
        if not rec.get("value"):  # 0/absent tiles/s is a failed run, not a result
            rec["error"] = f"degenerate bench value {rec.get('value')!r}"
    with open("/tmp/bench_sweep.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="+", default=None)
    ap.add_argument("--gate-tunnel", action="store_true",
                    help="probe tunnel health before each row; wait out "
                         "outages instead of burning the row timeout")
    ap.add_argument("--retry-failed", action="store_true",
                    help="re-run errored rows once at the end")
    args = ap.parse_args()

    names = args.only or list(SWEEPS)
    unknown = [n for n in names if n not in SWEEPS]
    if unknown:
        ap.error(f"unknown sweep name(s) {unknown}; choose from {list(SWEEPS)}")

    def run_all(batch):
        failed = []
        for name in batch:
            if args.gate_tunnel and not wait_tunnel():
                print(f"[sweep] tunnel never recovered; skipping {name}",
                      flush=True)
                failed.append(name)
                continue
            rec = run_one(name, SWEEPS[name])
            val = rec.get("value", "ERR")
            if "error" in rec:
                failed.append(name)
            print(f"{name:>18}: {val} tiles/s  ({rec['wall_s']}s)"
                  + (f"  ERROR: {rec['error'][-200:]}" if "error" in rec else ""),
                  flush=True)
        return failed

    failed = run_all(names)
    if failed and args.retry_failed:
        print(f"[sweep] retrying failed rows: {failed}", flush=True)
        failed = run_all(failed)
    if len(failed) == len(names):
        sys.exit("FATAL: every sweep row failed — no usable numbers produced.")


if __name__ == "__main__":
    main()
