#!/usr/bin/env python
"""Fine-grained probes for the hottest inference stages (Swin stage0 and the
component-proposal pipeline), with ablations. All timed callables are jitted
ONCE up front; completion forced by scalar fetch."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nuhtc_tpu.models.swin import SwinBlock, WindowAttention, window_partition, window_reverse
    from nuhtc_tpu.ops import morphology
    from nuhtc_tpu.ops.components import (
        component_boxes_from_raw,
        label_components_raw,
        resize_align_corners,
    )

    def timed(f, *a, n=5):
        r = f(*a)
        _ = float(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        _ = float(r)
        return (time.perf_counter() - t0) / n

    B = int(os.environ.get("B", 16))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, 128, 128, 96).astype(np.float32)).astype(jnp.bfloat16)

    # ---- stage0 block ablations ----------------------------------------
    class Blk(nn.Module):
        mode: str = "full"

        @nn.compact
        def __call__(self, x):
            b, h, w, c = x.shape
            ws = 7
            if self.mode == "full":
                for i in range(2):
                    x = SwinBlock(dim=96, num_heads=3, window_size=ws, shift=(i == 1),
                                  dtype=jnp.bfloat16, name=f"b{i}")(x, deterministic=True)
                return x
            if self.mode == "attn_only":
                for i in range(2):
                    shift = ws // 2 if i == 1 else 0
                    xp = jnp.pad(x, ((0, 0), (0, (-h) % ws), (0, (-w) % ws), (0, 0)))
                    if shift:
                        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
                    wins = window_partition(xp, ws)
                    wins = WindowAttention(dim=96, num_heads=3, window_size=ws,
                                           dtype=jnp.bfloat16, name=f"a{i}")(wins)
                    xp = window_reverse(wins, ws, h + (-h) % ws, w + (-w) % ws)
                    if shift:
                        xp = jnp.roll(xp, (shift, shift), axis=(1, 2))
                    x = x + xp[:, :h, :w, :]
                return x
            if self.mode == "partition_only":
                for i in range(2):
                    xp = jnp.pad(x, ((0, 0), (0, (-h) % ws), (0, (-w) % ws), (0, 0)))
                    wins = window_partition(xp, ws)
                    wins = wins * 1.0001
                    xp = window_reverse(wins, ws, h + (-h) % ws, w + (-w) % ws)
                    x = x + xp[:, :h, :w, :]
                return x
            if self.mode == "mlp_only":
                from nuhtc_tpu.models.layers import MLP
                for i in range(2):
                    y = nn.LayerNorm(epsilon=1e-5, name=f"n{i}")(x)
                    x = x + MLP(hidden=384, out=96, dtype=jnp.bfloat16, name=f"m{i}")(y)
                return x
            raise ValueError(self.mode)

    for mode in ("full", "attn_only", "partition_only", "mlp_only"):
        m = Blk(mode=mode)
        p = m.init(jax.random.PRNGKey(0), x0)
        f = jax.jit(lambda p_, x_, m_=m: m_.apply(p_, x_).astype(jnp.float32).sum())
        t = timed(f, p, x0)
        print(f"stage0 2blk [{mode:>15}]: {t * 1000:7.1f} ms")

    # window attention on pre-partitioned input (isolates attn math from layout)
    wins0 = jnp.asarray(rng.randn(B * 361, 49, 96).astype(np.float32)).astype(jnp.bfloat16)
    wa = WindowAttention(dim=96, num_heads=3, window_size=7, dtype=jnp.bfloat16)
    pw = wa.init(jax.random.PRNGKey(0), wins0)
    f = jax.jit(lambda p_, w_: wa.apply(p_, w_).astype(jnp.float32).sum())
    t = timed(f, pw, wins0)
    print(f"window-attn math only (x1):  {t * 1000:7.1f} ms")

    # ---- components with realistic blob masks ---------------------------
    yy, xx = np.mgrid[:512, :512]
    mask_np = np.zeros((B, 512, 512), bool)
    r = np.random.RandomState(1)
    for b in range(B):
        for _ in range(60):  # ~60 nuclei per tile
            cy, cx, rad = r.randint(20, 492), r.randint(20, 492), r.randint(5, 14)
            mask_np[b] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rad * rad
    maskv = jnp.asarray(mask_np)
    print(f"mask density: {float(maskv.mean()):.3f}")

    openf = jax.jit(lambda m: jax.vmap(lambda x: morphology.binary_open(x, 5, 2))(m).sum())
    t = timed(openf, maskv)
    print(f"binary open x2:            {t * 1000:7.1f} ms")
    fillf = jax.jit(lambda m: jax.vmap(morphology.fill_holes)(m).astype(jnp.float32).sum())
    t = timed(fillf, maskv)
    print(f"fill holes:                {t * 1000:7.1f} ms")

    lab_fn = jax.jit(lambda m: jax.vmap(label_components_raw)(m))
    t = timed(lambda m: lab_fn(m).sum(), maskv)
    print(f"CCL propagation:           {t * 1000:7.1f} ms")
    labv = lab_fn(maskv)

    boxf = jax.jit(
        lambda l, m: jax.vmap(lambda a, b: component_boxes_from_raw(a, b, 512)[0])(l, m).sum()
    )
    t = timed(boxf, labv, maskv)
    print(f"box extraction (K=512):    {t * 1000:7.1f} ms")
    boxf256 = jax.jit(
        lambda l, m: jax.vmap(lambda a, b: component_boxes_from_raw(a, b, 256)[0])(l, m).sum()
    )
    t = timed(boxf256, labv, maskv)
    print(f"box extraction (K=256):    {t * 1000:7.1f} ms")


if __name__ == "__main__":
    main()
