#!/usr/bin/env python
"""TPU validation probe: fused Pallas window-attention vs XLA path at block
level (stage0/1/2 shapes) — correctness (bf16-tolerance) and latency."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn
from nuhtc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from nuhtc_tpu.models.swin import SwinBlock

def timed(f, *a, n=6):
    r = f(*a); _ = float(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    _ = float(r)
    return (time.perf_counter() - t0) / n

rng = np.random.RandomState(0)
for (H, C, NH, tag) in ((128, 96, 3, "stage0"), (64, 192, 6, "stage1"), (32, 384, 12, "stage2")):
    x = jnp.asarray(rng.randn(16, H, H, C).astype(np.float32)).astype(jnp.bfloat16)
    class B2(nn.Module):
        fused: bool = True
        @nn.compact
        def __call__(self, x):
            for i in range(2):
                x = SwinBlock(dim=C, num_heads=NH, window_size=7, shift=(i == 1),
                              fused_attention=self.fused, dtype=jnp.bfloat16, name=f"b{i}")(x, deterministic=True)
            return x
    mf, mx = B2(True), B2(False)
    p = mx.init(jax.random.PRNGKey(0), x)
    ff = jax.jit(lambda p_, x_: mf.apply(p_, x_))
    fx = jax.jit(lambda p_, x_: mx.apply(p_, x_))
    of = np.asarray(ff(p, x), np.float32); ox = np.asarray(fx(p, x), np.float32)
    d = np.abs(of - ox); s = ox.std()
    print(f"{tag}: maxdiff={d.max():.4f} reldiff={d.max()/s:.4f} mean={d.mean():.5f} std={s:.3f}")
    tf = timed(lambda p_, x_: ff(p_, x_).astype(jnp.float32).sum(), p, x)
    tx = timed(lambda p_, x_: fx(p_, x_).astype(jnp.float32).sum(), p, x)
    print(f"{tag}: fused {tf*1000:6.1f} ms  vs  xla {tx*1000:6.1f} ms")
