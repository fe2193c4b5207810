#!/usr/bin/env python
"""Benchmark: PanNuke patch-inference throughput (256px tiles/sec/chip).

Runs the flagship full-size NuHTC (Swin-T, bf16) on batches of 256px tiles
(rescaled ×2 to 512² as in the reference test pipeline, config :325-339),
including device-side mask pasting — the same work the reference measures in
tools/analysis_tools/benchmark.py:101-132 (2000-iter loop on CUDA).

Methodology: matches the reference benchmark, which times the model call
only (torch.cuda.synchronize around ``model()`` — data loading excluded).
Inputs are device-resident, the timed loop dispatches N batched steps
(device executes in order), and completion is forced by fetching a scalar
reduction of the final step's outputs (on the axon tunnel
``block_until_ready`` does not block, and host↔device transfers are
tunnel-limited to ~30 MB/s — a dev-environment artifact measured separately
from model throughput).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 35.0 — our estimate of the reference's A100
tiles/sec for this model. The repo publishes no number and its PyTorch
stack cannot run here (no mmcv/pycocotools), so the constant is derived
from public benchmarks of the same architecture family (full derivation
in BASELINE.md "A100 baseline derivation"): mmdetection's HTC inference
fps, Swin-T detector fps from the Swin paper, scaled for the 512² input,
A100-vs-V100 speedup, and the reference's per-image CPU watershed hop.
The round target is vs_baseline ≥ 5.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

A100_TILES_PER_SEC_EST = 35.0

_PROBE_SRC = "import jax; x = jax.numpy.ones((128, 128)); print(float((x @ x).sum()))"


def _probe_backend(timeout: float = 150.0) -> bool:
    """Run a trivial matmul in a *subprocess* and report success.

    The axon TPU tunnel occasionally wedges; when it does, any jax import in
    this process would block forever inside the plugin's retry loop. A killed
    subprocess keeps the parent clean so we can retry.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def wait_for_backend(max_wait: float) -> bool:
    """Probe-with-backoff until the backend answers or ``max_wait`` expires.

    The tunnel has been observed to self-recover in ~15 min (CLAUDE.md), so
    the default window (40 min, BENCH_MAX_WAIT_S) comfortably covers a
    transient outage instead of erasing the round's number (round-2 failure
    mode: BENCH_r02.json rc=1).
    """
    deadline = time.time() + max_wait
    delay = 60.0
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        if _probe_backend():
            print(f"# backend probe ok (attempt {attempt})", file=sys.stderr)
            return True
        remaining = deadline - time.time()
        print(
            f"# backend probe failed (attempt {attempt}, {time.time()-t0:.0f}s); "
            f"{remaining:.0f}s left in retry window",
            file=sys.stderr,
        )
        if remaining <= 0:
            return False
        time.sleep(min(delay, max(remaining, 1.0)))
        delay = min(delay * 1.5, 300.0)


def main():
    # Guard against a wedged/unavailable backend BEFORE importing jax here:
    # probe in subprocesses with backoff, and fall back to CPU only if the
    # window expires (a low CPU number beats no number at all).
    max_wait = float(os.environ.get("BENCH_MAX_WAIT_S", "2400"))
    in_fallback = os.environ.get("BENCH_CPU_FALLBACK") == "1"
    if not in_fallback and not wait_for_backend(max_wait):
        print(
            "# backend unavailable after retry window — falling back to CPU "
            "(expect a very low number; the TPU tunnel was down all round)",
            file=sys.stderr,
        )
        # re-exec in a fresh interpreter with the axon site stripped from
        # PYTHONPATH: a wedged tunnel can hang even JAX_PLATFORMS=cpu in a
        # process where the plugin's sitecustomize already ran
        env = dict(os.environ)
        env["BENCH_CPU_FALLBACK"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ":".join(
            p
            for p in ("/root/repo:" + env.get("PYTHONPATH", "")).split(":")
            if p and ".axon_site" not in p
        )
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)

    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nuhtc_tpu.models.detector import NuHTC

    batch = int(os.environ.get("NUHTC_BENCH_BATCH", "16"))
    tile = 256
    scale = 2.0
    size = int(tile * scale)

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32
    # perf-probe knobs (recorded in the JSON): banded-roi chunk/band override
    roi_chunk = int(os.environ.get("NUHTC_ROI_CHUNK", "16"))
    # env defaults MUST match the NuHTC dataclass defaults — bench passes
    # these explicitly, so a stale value here silently overrides the model
    # (round-5 bug: the first final-bench run measured band 32 after the
    # band-24 default landed)
    roi_band = int(os.environ.get("NUHTC_ROI_BAND", "24"))
    roi_overflow = int(os.environ.get("NUHTC_ROI_OVERFLOW", "128"))
    model = NuHTC(num_classes=5, dtype=dtype, scale_factor=scale,
                  roi_chunk=roi_chunk, roi_band=roi_band,
                  roi_overflow=roi_overflow)

    img0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img0, method="init_forward")

    from nuhtc_tpu.ops.mask_paste import paste_label_map

    @jax.jit
    def step(params, img):
        det = model.apply(params, img)
        # device mask paste to the tile frame (reference benchmark.py times
        # model() which includes get_seg_masks paste); production WSI path
        # uses the compact instance label map
        lab = jax.vmap(
            lambda m, b, v: paste_label_map(m, b, v, (tile, tile), threshold=0.5)
        )(det["mask_probs"], det["boxes"], det["valid"])
        # scalar checksum over every output forces full execution
        s = (
            det["boxes"].sum()
            + det["scores"].sum()
            + det["labels"].sum()
            + det["valid"].sum()
            + lab.sum()
        )
        return s

    rng = np.random.RandomState(0)
    # device-resident inputs (materialized by the warmup pass)
    imgs = [
        jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32)) for _ in range(4)
    ]

    # warmup / compile + force input upload
    for im in imgs:
        float(step(params, im))

    n_iters = 20 if backend != "cpu" else 2
    t0 = time.perf_counter()
    acc = []
    for i in range(n_iters):
        acc.append(step(params, imgs[i % len(imgs)]))
    _ = float(acc[-1])  # device executes in order: final value ⇒ all done
    dt = time.perf_counter() - t0

    tiles_per_sec = batch * n_iters / dt

    # WSI stage-B number of record (driver metric is "patch + WSI modes"):
    # full loop — threaded reads → device forward + compact label map →
    # host contours → GeoJSON — with wall-time attribution separating
    # device/tunnel stall from host cost. Failure-isolated so the patch
    # number always survives. BENCH_WSI=0 skips.
    wsi_stats = None
    if os.environ.get("BENCH_WSI", "1") == "1":
        try:
            wsi_stats = _bench_wsi(batch)
        except Exception as e:  # pragma: no cover - defensive
            wsi_stats = {"error": f"{type(e).__name__}: {e}"}

    print(
        json.dumps(
            {
                "metric": "pannuke_patch_inference_256px_tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(tiles_per_sec / A100_TILES_PER_SEC_EST, 3),
                # active kernel configuration — makes regressions attributable
                # (VERDICT r3 weak #2: the number of record must say what ran)
                "kernels": {
                    "backend": backend,
                    "swin_kernel": os.environ.get("NUHTC_SWIN_KERNEL", "block"),
                    "swin_kernel_min_hw": int(
                        os.environ.get("NUHTC_SWIN_KERNEL_MIN_HW", 256)
                    ),
                    "components_kernel": os.environ.get(
                        "NUHTC_COMPONENTS_KERNEL", "xla"
                    ),
                    "roi_band": model.roi_band,
                    "roi_chunk": model.roi_chunk,
                    "roi_overflow": model.roi_overflow,
                    "mask_tail": os.environ.get("NUHTC_MASK_TAIL", "d2s"),
                    "mask_conv0_fold": os.environ.get("NUHTC_MASK_CONV0_FOLD", "0"),
                    "batch": batch,
                    "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
                },
                "wsi": wsi_stats,
            }
        )
    )


def _bench_wsi(batch: int, n_tiles: int = 64):
    """WSI stage-B loop on a synthetic slide (same recipe as
    tools/analysis_tools/benchmark_wsi.py); returns tiles/s + attribution."""
    import tempfile

    import cv2
    import jax

    from nuhtc_tpu.apis.inference import init_detector
    from nuhtc_tpu.config.config import Config
    from nuhtc_tpu.wsi.infer import infer_slide
    from nuhtc_tpu.wsi.slide import ImageReader

    cols = 8
    rows = (n_tiles + cols - 1) // cols
    hw = (rows * 256, cols * 256)
    rng = np.random.RandomState(0)
    img = rng.randint(160, 230, (hw[0], hw[1], 3), np.uint8)
    yy, xx = np.mgrid[:64, :64]
    blob = ((yy - 32) ** 2 + (xx - 32) ** 2 <= 150).astype(np.uint8)
    for _ in range(n_tiles * 20):
        y, x = rng.randint(0, hw[0] - 64), rng.randint(0, hw[1] - 64)
        reg = img[y : y + 64, x : x + 64].astype(np.int16)
        reg[..., 0] -= 60 * blob
        reg[..., 2] -= 30 * blob
        img[y : y + 64, x : x + 64] = np.clip(reg, 0, 255).astype(np.uint8)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "synth.png")
        cv2.imwrite(path, img[..., ::-1])
        slide = ImageReader(path)
        coords = np.stack(
            [
                np.tile(np.arange(cols) * 256, rows)[:n_tiles],
                np.repeat(np.arange(rows) * 256, cols)[:n_tiles],
            ],
            axis=1,
        )
        cfg = Config.fromfile("configs/nuhtc/htc_lite_swin_fpn_pannuke.py")
        dev = jax.default_backend() != "cpu"
        engine = init_detector(
            cfg, None, batch_size=batch, device_preprocess=dev, compact_masks=dev
        )
        classes = [f"c{i}" for i in range(engine.num_classes)]
        # pass 1: compile; pass 2: the number
        infer_slide(engine, slide, coords, td, "synth", classes=classes, progress=False)
        stats = infer_slide(
            engine, slide, coords, td, "synth", classes=classes, progress=False
        )
    return {
        "tiles_per_sec": round(stats["tiles_per_sec"], 2),
        "tiles": stats["tiles"],
        "seconds": round(stats["seconds"], 3),
        "read_wait_s": round(stats["read_wait_s"], 3),
        "dispatch_upload_s": round(stats["dispatch_s"], 3),
        "collect_device_download_s": round(stats["collect_s"], 3),
        # measured split of collect (engine's 4-byte sync fetch): device-wait
        # vs tunnel bulk download — VERDICT r4 weak #4
        "collect_device_s": round(stats.get("collect_device_s", 0.0), 3),
        "collect_download_s": round(stats.get("collect_download_s", 0.0), 3),
        "host_post_s": round(stats["post_s"], 3),
        "device_path": dev,
    }


if __name__ == "__main__":
    main()
