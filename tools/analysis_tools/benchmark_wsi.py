#!/usr/bin/env python
"""WSI stage-B throughput benchmark: synthesize a slide image, run the full
tile-inference loop (threaded reads → device forward + compact label-map →
host contours → GeoJSON export) and report tiles/sec.

This measures the production WSI path (reference tools/infer_wsi.py stage B,
SURVEY.md §3.3 hot loop), including host IO overlap and the compact transfer
path; bench.py measures the pure-model patch throughput.

Note: on the axon dev tunnel host↔device bandwidth is ~31 MB/s, so absolute
WSI tiles/s here is tunnel-limited; the compact path keeps per-batch traffic
to ~3 MB up / ~2.3 MB down at B16.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--host-path", action="store_true",
                    help="disable device preprocess + compact masks")
    args = ap.parse_args()

    import jax

    from nuhtc_tpu.apis.inference import init_detector
    from nuhtc_tpu.config.config import Config
    from nuhtc_tpu.utils.cache import enable_compilation_cache
    from nuhtc_tpu.wsi.infer import infer_slide
    from nuhtc_tpu.wsi.slide import ImageReader

    enable_compilation_cache()

    # synthetic slide: tiles/8 × 8 grid of 256px tiles with nuclei-ish blobs
    cols = 8
    rows = (args.tiles + cols - 1) // cols
    hw = (rows * 256, cols * 256)
    rng = np.random.RandomState(0)
    img = rng.randint(160, 230, (hw[0], hw[1], 3), np.uint8)  # pale tissue
    yy, xx = np.mgrid[:64, :64]
    blob = ((yy - 32) ** 2 + (xx - 32) ** 2 <= 150).astype(np.uint8)
    for _ in range(args.tiles * 20):
        y, x = rng.randint(0, hw[0] - 64), rng.randint(0, hw[1] - 64)
        reg = img[y : y + 64, x : x + 64].astype(np.int16)
        reg[..., 0] -= 60 * blob
        reg[..., 2] -= 30 * blob
        img[y : y + 64, x : x + 64] = np.clip(reg, 0, 255).astype(np.uint8)

    with tempfile.TemporaryDirectory() as td:
        import cv2

        path = os.path.join(td, "synth.png")
        cv2.imwrite(path, img[..., ::-1])
        slide = ImageReader(path)

        coords = np.stack(
            [
                np.tile(np.arange(cols) * 256, rows)[: args.tiles],
                np.repeat(np.arange(rows) * 256, cols)[: args.tiles],
            ],
            axis=1,
        )

        cfg = Config.fromfile("configs/nuhtc/htc_lite_swin_fpn_pannuke.py")
        dev = (jax.default_backend() != "cpu") and not args.host_path
        engine = init_detector(
            cfg, None, batch_size=args.batch_size,
            device_preprocess=dev, compact_masks=dev,
        )

        # warm-up compile on one batch
        t0 = time.perf_counter()
        stats = infer_slide(
            engine, slide, coords, td, "synth",
            classes=[f"c{i}" for i in range(engine.num_classes)],
            progress=False,
        )
        warm = time.perf_counter() - t0
        # timed second pass (compile cached)
        stats = infer_slide(
            engine, slide, coords, td, "synth",
            classes=[f"c{i}" for i in range(engine.num_classes)],
            progress=False,
        )
        print(
            f"wsi stage-B: {stats['tiles']} tiles in {stats['seconds']:.2f}s "
            f"→ {stats['tiles_per_sec']:.1f} tiles/s "
            f"({stats['nuclei']} nuclei; first pass incl. compile {warm:.1f}s; "
            f"device_path={dev})"
        )
        acct = sum(stats[k] for k in ("read_wait_s", "dispatch_s", "collect_s", "post_s"))
        print(
            "attribution: "
            f"read_wait {stats['read_wait_s']:.2f}s · "
            f"dispatch(upload) {stats['dispatch_s']:.2f}s · "
            f"collect(device+download) {stats['collect_s']:.2f}s · "
            f"host post(contours/export) {stats['post_s']:.2f}s · "
            f"other {stats['seconds'] - acct:.2f}s"
        )


if __name__ == "__main__":
    main()
