#!/usr/bin/env python
"""Training-step throughput: full NuHTC train step (RPN + 3 cascade stages +
mask + semantic losses, AdamW + EMA) on synthetic 256²-tile batches.
Reports steps/s and tiles/s on the local device(s)."""

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

    from nuhtc_tpu.models.detector import NuHTC
    from nuhtc_tpu.train.train_state import create_train_state, make_train_step

    B = int(os.environ.get("B", 8))
    size = 256  # train tiles are 256² (no test-time ×2 rescale)
    model = NuHTC(num_classes=5, dtype=jnp.bfloat16, scale_factor=1.0)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, size, size, 3).astype(np.float32))
    g = 64
    cx = rng.uniform(8, size - 8, (B, g))
    cy = rng.uniform(8, size - 8, (B, g))
    half = rng.uniform(4, 12, (B, g))
    batch = dict(
        img=img,
        gt_boxes=jnp.asarray(
            np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32)
        ),
        gt_labels=jnp.asarray(rng.randint(0, 5, (B, g)), dtype=jnp.int32),
        gt_valid=jnp.asarray(np.ones((B, g), bool)),
        gt_patches=jnp.asarray(rng.rand(B, g, 28, 28).astype(np.float32) > 0.4, dtype=jnp.float32),
        gt_semantic=jnp.asarray(rng.randint(0, 2, (B, size // 4, size // 4)), dtype=jnp.int32),
    )

    params = model.init(jax.random.PRNGKey(0), img[:1], method="init_forward")
    state, tx = create_train_state(model, params)
    train_step = make_train_step(model, tx)
    jit_step = jax.jit(train_step)

    key = jax.random.PRNGKey(1)
    state, metrics = jit_step(state, batch, key)
    _ = float(metrics["total"])  # compile + warm

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = jit_step(state, batch, jax.random.fold_in(key, i))
    _ = float(metrics["total"])
    dt = (time.perf_counter() - t0) / n
    print(
        f"train step B={B}: {dt * 1000:.0f} ms/step → {1 / dt:.2f} steps/s, "
        f"{B / dt:.1f} tiles/s  (total loss {float(metrics['total']):.3f})"
    )


if __name__ == "__main__":
    main()
