#!/usr/bin/env python
"""Stage-by-stage latency breakdown of the inference pipeline on the current
backend. Forces host fetch per timing (block_until_ready is unreliable on the
axon tunnel)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])  # force
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nuhtc_tpu.models.detector import NuHTC
    from nuhtc_tpu.models.rpn_head import rpn_proposals
    from nuhtc_tpu.ops.components import component_proposals
    from nuhtc_tpu.ops import boxes as box_ops

    B = int(os.environ.get("B", 16))
    model = NuHTC(num_classes=5, dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(0).randn(B, 512, 512, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")

    # 1. backbone+neck
    feats_fn = jax.jit(lambda p, x: model.apply(p, x, method="extract_feats"))
    t, feats = timeit(feats_fn, params, img)
    print(f"backbone+fpn: {t * 1000:.1f} ms")

    # 2. rpn head + proposals
    def rpn_fn(p, feats):
        cls, reg = model.apply(p, feats, method=lambda m, f: m.rpn_head(f))
        return rpn_proposals(cls, reg, (512, 512), nms_pre=3000, max_per_img=1000)

    rpn_jit = jax.jit(rpn_fn)
    t, props = timeit(rpn_jit, params, feats)
    print(f"rpn+proposals: {t * 1000:.1f} ms")

    # 3. semantic head
    sem_fn = jax.jit(lambda p, f: model.apply(p, f, method=lambda m, f_: m.semantic_head(f_)))
    t, sem = timeit(sem_fn, params, feats)
    print(f"semantic head: {t * 1000:.1f} ms")

    # 4. watershed/components
    ws_fn = jax.jit(
        lambda sl: jax.vmap(lambda s: component_proposals(s[..., 0], (512, 512)))(sl)
    )
    t, ws = timeit(ws_fn, sem[0])
    print(f"component proposals: {t * 1000:.1f} ms")

    # 5. one cascade stage
    rois = jnp.concatenate([ws[0][..., :4], props[0]], axis=1)

    def stage_fn(p, feats, semf, rois):
        return model.apply(
            p, feats, semf, rois, method=lambda m, f, s, r: m._bbox_stage(0, f, s, r)
        )

    stage_jit = jax.jit(stage_fn)
    t, _ = timeit(stage_jit, params, feats, sem[1], rois)
    print(f"bbox stage (1 of 3): {t * 1000:.1f} ms  (rois={rois.shape})")

    # 6. mask forward on 500 dets
    det_boxes = props[0][:, :500]

    def mask_fn(p, feats, semf, boxes):
        return model.apply(
            p, feats, semf, boxes, method=lambda m, f, s, b: m._mask_forward(f, s, b)
        )

    mask_jit = jax.jit(mask_fn)
    t, _ = timeit(mask_jit, params, feats, sem[1], det_boxes)
    print(f"mask forward (500 dets): {t * 1000:.1f} ms")

    # 7. full pipeline
    full = jax.jit(lambda p, x: model.apply(p, x))
    t, _ = timeit(full, params, img)
    print(f"FULL pipeline: {t * 1000:.1f} ms  → {B / t:.1f} tiles/s")
