#!/usr/bin/env python
"""Probe roi_align chunk/unroll variants on the TPU (bbox-stage shape)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from nuhtc_tpu.ops.roi_align import roi_align

    def timed(f, *a, n=5):
        r = f(*a)
        _ = float(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        _ = float(r)
        return (time.perf_counter() - t0) / n

    B, P = 16, 1512
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, 128, 128, 64).astype(np.float32)).astype(jnp.bfloat16)
    r0 = rng.uniform(0, 440, (B, P, 2))
    wh = rng.uniform(8, 64, (B, P, 2))
    rois = jnp.asarray(np.concatenate([r0, r0 + wh], -1).astype(np.float32))

    for chunk, unroll in ((16, 1), (16, 2), (16, 4), (32, 1), (32, 2), (64, 1), (8, 2)):
        f = jax.jit(lambda fe, ro, c=chunk, u=unroll: jax.vmap(
            lambda f1, r1: roi_align(f1, r1, 0.25, 7, sampling_ratio=2,
                                     chunk=c, unroll=u)
        )(fe, ro).astype(jnp.float32).sum())
        t = timed(f, feat, rois)
        print(f"chunk={chunk:3d} unroll={unroll}:  {t * 1000:7.1f} ms")


if __name__ == "__main__":
    main()
