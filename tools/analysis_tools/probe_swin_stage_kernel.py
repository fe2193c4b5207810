#!/usr/bin/env python
"""Probe: does the fused full-block Pallas kernel beat XLA at stage-2/3 shapes?

Round 2 measured the attention-only band kernel losing at 32² and below, so
both kernel tiers gate at h*w >= 64² (models/swin.py). The full-block kernel
has different economics (it also folds the LN2/MLP HBM round-trips), so this
probe times a full stage (6 blocks at 32²·C384, 2 blocks at 16²·C768) under
each mode on the real TPU, with pipelined dispatch + checksum fetch (axon
block_until_ready is a no-op — see CLAUDE.md).

Usage: python tools/analysis_tools/probe_swin_stage_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from nuhtc_tpu.models.swin import SwinBlock
    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() != "cpu", "run on the TPU"

    class Stage(nn.Module):
        dim: int
        heads: int
        depth: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.depth):
                x = SwinBlock(
                    dim=self.dim, num_heads=self.heads, window_size=7,
                    shift=(i % 2 == 1), dtype=jnp.bfloat16,
                    name=f"b{i}",
                )(x, deterministic=True)
            return x

    for dim, heads, hw, depth in ((384, 12, 32, 6), (768, 24, 16, 2)):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, hw, hw, dim).astype(np.float32))
        st = Stage(dim=dim, heads=heads, depth=depth)
        os.environ["NUHTC_SWIN_KERNEL"] = "none"
        os.environ["NUHTC_SWIN_KERNEL_MIN_HW"] = "1"
        params = st.init(jax.random.PRNGKey(0), x)

        ref = None
        for mode in ("none", "attn", "block"):
            os.environ["NUHTC_SWIN_KERNEL"] = mode
            fn = jax.jit(lambda p, v: st.apply(p, v))
            try:
                out = fn(params, x)
                float(jnp.sum(out.astype(jnp.float32)))  # force completion
            except Exception as e:  # Mosaic rejection at this shape
                print(f"stage dim={dim} hw={hw} mode={mode}: FAILED {type(e).__name__}: {e}")
                continue
            # pipelined timing: dispatch N, fetch one checksum at the end
            n = 30
            t0 = time.perf_counter()
            acc = None
            for _ in range(n):
                acc = fn(params, x)
            float(jnp.sum(acc.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / n * 1e3
            o = np.asarray(out, np.float32)
            if mode == "none":
                ref = o
                derr = 0.0
            else:
                # baseline may have failed → still report timings
                derr = float(np.abs(o - ref).max()) if ref is not None else float("nan")
            print(
                f"stage dim={dim} hw={hw} depth={depth} mode={mode}: "
                f"{dt:.2f} ms/stage (B16), max_abs vs none = {derr:.4g}",
                flush=True,
            )


if __name__ == "__main__":
    main()
