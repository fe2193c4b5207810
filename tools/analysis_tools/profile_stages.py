#!/usr/bin/env python
"""Stage-by-stage latency breakdown of the inference pipeline.

Methodology: device-resident inputs, pipelined dispatch (n calls), completion
forced by fetching a scalar reduction (block_until_ready is unreliable on the
axon tunnel; transfers are slow and excluded)."""

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
    from nuhtc_tpu.models.rpn_head import rpn_proposals
    from nuhtc_tpu.ops.components import component_proposals
    from nuhtc_tpu.ops.mask_paste import paste_masks

    def timed(f, *a, n=5):
        r = f(*a)
        _ = float(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        _ = float(r)
        return (time.perf_counter() - t0) / n

    B = int(os.environ.get("B", 16))
    model = NuHTC(num_classes=5, dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(0).randn(B, 512, 512, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")

    feats = jax.jit(lambda p, x: model.apply(p, x, method="extract_feats"))(params, img)
    sem = jax.jit(lambda p, f: model.apply(p, f, method=lambda m, f_: m.semantic_head(f_)))(
        params, feats
    )
    rois = jnp.tile(jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (B, 1512, 1))
    dets = jnp.tile(jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (B, 500, 1))

    t = timed(jax.jit(lambda p, x: model.apply(p, x, method="extract_feats")[0].sum()), params, img)
    print(f"backbone+fpn:        {t * 1000:7.1f} ms")
    t = timed(
        jax.jit(lambda p, f: model.apply(p, f, method=lambda m, f_: m.semantic_head(f_))[0].sum()),
        params, feats,
    )
    print(f"semantic head:       {t * 1000:7.1f} ms")
    t = timed(
        jax.jit(lambda sl: jax.vmap(lambda s: component_proposals(s[..., 0], (512, 512)))(sl)[0].sum()),
        sem[0],
    )
    print(f"component proposals: {t * 1000:7.1f} ms")

    def rpn_fn(p, feats):
        cls, reg = model.apply(p, feats, method=lambda m, f: m.rpn_head(f))
        return rpn_proposals(cls, reg, (512, 512), nms_pre=3000, max_per_img=1000)[0].sum()

    t = timed(jax.jit(rpn_fn), params, feats)
    print(f"rpn+proposals:       {t * 1000:7.1f} ms")

    t = timed(
        jax.jit(lambda p, f, s, r: model.apply(
            p, f, s, r, method=lambda m, f_, s_, r_: m._bbox_stage(0, f_, s_, r_)
        )[0].sum()),
        params, feats, sem[1], rois,
    )
    print(f"bbox stage (x3):     {t * 1000:7.1f} ms")

    t = timed(
        jax.jit(lambda p, f, s, b: model.apply(
            p, f, s, b, method=lambda m, f_, s_, b_: m._mask_forward(f_, s_, b_)
        ).sum()),
        params, feats, sem[1], dets,
    )
    print(f"mask forward:        {t * 1000:7.1f} ms")

    scores = jnp.abs(jnp.sin(jnp.arange(B * 1512 * 6, dtype=jnp.float32))).reshape(B, 1512, 6)
    t = timed(
        jax.jit(lambda b, s: jax.vmap(model._multiclass_nms)(b, s, jnp.ones((B, 1512), bool))[
            "scores"
        ].sum()),
        rois, scores,
    )
    print(f"multiclass nms:      {t * 1000:7.1f} ms")

    probs = jnp.abs(jnp.sin(jnp.arange(B * 500 * 28 * 28, dtype=jnp.float32))).reshape(B, 500, 28, 28)
    t = timed(
        jax.jit(lambda m_, b_: jax.vmap(
            lambda m2, b2: paste_masks(m2, b2, (256, 256), threshold=0.5)
        )(m_, b_).sum()),
        probs, dets / 2.0,
    )
    print(f"mask paste (device): {t * 1000:7.1f} ms")

    t = timed(jax.jit(lambda p, x: model.apply(p, x)["scores"].sum()), params, img)
    print(f"FULL pipeline:       {t * 1000:7.1f} ms → {B / t:.1f} tiles/s")


if __name__ == "__main__":
    main()
