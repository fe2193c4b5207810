"""RoI feature extractors (pure functions — no learned params).

``attention_roi_features`` re-implements the reference AttentionRoIExtractor
(nuhtc/models/roi_extractors_cus.py:165-265), the extractor used by all four
shipped configs: the per-RoI feature is the **sum over pyramid levels** of
- levels < start_level (0, 1): standard RoIAlign of every RoI on that level;
- levels ≥ start_level (2, 3): the cosine-similarity attention-pooled global
  vector, broadcast over the output grid.

``single_roi_features`` is the plain single-level RoIAlign used for the
semantic branch (featmap_strides=[4] → reference BaseRoIExtractor fast path).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from nuhtc_tpu.ops.roi_align import (
    roi_align, attention_pool, banded_plan, banded_chunk_t2,
    overflow_plan, overflow_merge,
)


def attention_roi_features(
    feats: Sequence[jnp.ndarray],  # per-level (H, W, C) for ONE image
    rois: jnp.ndarray,  # (R, 4)
    output_size: int,
    sampling_ratio: int,
    strides: Sequence[int] = (4, 8, 16, 32),
    start_level: int = 2,
    thres: float = 0.965926,
    max_grid: int = 8,
    exact: bool = False,
    band: int | None = None,
    overflow_slots: int = 128,
) -> jnp.ndarray:
    """→ (R, out, out, C). vmap over the batch axis for batched use.
    ``exact=True`` forces f32/HIGHEST internals (parity testing).
    ``band``: x-banded RoIAlign (see ops/roi_align.py) — pass rois sorted by
    x-center for effect; exact for ≤ overflow_slots wide rois."""
    out = None
    for lvl, (feat, stride) in enumerate(zip(feats, strides)):
        if lvl < start_level:
            t = roi_align(
                feat,
                rois,
                1.0 / stride,
                output_size,
                sampling_ratio=sampling_ratio,
                max_grid=max_grid,
                exact=exact,
                band=band,
                overflow_slots=overflow_slots,
            )
        else:
            pooled = attention_pool(feat, rois, stride, thres, exact=exact)  # (R, C)
            t = jnp.broadcast_to(
                pooled[:, None, None, :],
                (rois.shape[0], output_size, output_size, pooled.shape[-1]),
            )
        out = t if out is None else out + t
    return out


def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray,
                 cdtype=jnp.bfloat16) -> jnp.ndarray:
    """SAME 3×3 conv as an unfold + matmul (x (N, S, S, C), kernel HWIO
    (3, 3, C, C') pre-reshaped or not) → (N, S, S, C') f32 pre-bias.
    Used to fold the mask head's conv0 into the banded scan body and to map
    overflow-repair features through the same linear op."""
    n, s, _, c = x.shape
    co = kernel.shape[-1]
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [p[:, dy:dy + s, dx:dx + s, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (N, S, S, 9C) in (dy, dx, c) order — matches kernel.reshape(9C, C')
    w9 = kernel.reshape(9 * c, co).astype(cdtype)
    return jnp.dot(
        cols.reshape(n, s * s, 9 * c).astype(cdtype), w9,
        preferred_element_type=jnp.float32,
    ).reshape(n, s, s, co)


def single_roi_features(
    feat: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,
    output_size: int,
    stride: int = 4,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    pool_from: int | None = None,
    exact: bool = False,
    band: int | None = None,
    overflow_slots: int = 128,
) -> jnp.ndarray:
    return roi_align(
        feat, rois, 1.0 / stride, output_size, sampling_ratio=sampling_ratio,
        max_grid=max_grid, pool_from=pool_from, exact=exact,
        band=band, overflow_slots=overflow_slots,
    )


def banded_stage_features(
    feats: Sequence[jnp.ndarray],  # per-level (H, W, C) for ONE image
    sem: jnp.ndarray,  # semantic branch feature (H0, W0, C)
    rois: jnp.ndarray,  # (R, 4) — x-sorted by the caller for band coherence
    output_size: int,
    sampling_ratio: int,
    strides: Sequence[int] = (4, 8, 16, 32),
    start_level: int = 2,
    thres: float = 0.965926,
    max_grid: int = 8,
    band: int = 32,
    overflow_slots: int = 128,
    sem_pool_from: int | None = None,
    fc0_kernel: jnp.ndarray | None = None,
    conv0_kernel: jnp.ndarray | None = None,
    yband: int | None = None,
    chunk: int = 16,
) -> jnp.ndarray:
    """Banded equivalent of ``attention_roi_features(...) +
    single_roi_features(sem, ...)`` — ONE fused scan, ONE union overflow
    repair.

    All banded levels (fine pyramid levels + semantic) run inside a single
    lax.scan whose body contracts every level's band window for one roi chunk
    and accumulates in-body. Per-roi overflow flags are unioned across levels
    and the union set is recomputed dense at once, merged into the summed
    result by a one-hot matmul + select (a full-tensor scatter per level
    costs more than banding saves — measured on v5e). Returns FLAT
    (R, out*out*C) in (i, j, c) order — the bbox head consumes it directly
    (see models/bbox_head.py flatten convention); the mask path reshapes to
    spatial.

    ``fc0_kernel`` (out*out*C, F): fold the bbox head's shared_fc0 matmul
    into the scan body — each chunk completes its feature (band levels +
    attention-pool contribution, moved inside the loop) and immediately
    contracts with fc0, so the (R, out*out*C) activation never materializes
    (it cost ~3 ms/stage of HBM traffic + layout copies at B16×1512 rois).
    Returns (R, F) f32 pre-bias outputs; exact vs the unfused path by
    linearity (repair happens in fc0-output space).

    ``conv0_kernel`` (3, 3, C, C'): same idea for the mask head — each
    chunk's completed (chunk, out, out, C) feature goes through a SAME 3×3
    unfold-matmul conv in-body; returns FLAT (R, out*out*C') f32 pre-bias
    conv0 outputs (repair maps through the same conv — linear). Mutually
    exclusive with fc0_kernel.
    """
    r = rois.shape[0]
    dtype = feats[0].dtype
    cdtype = jnp.bfloat16

    # Banded inputs — the fine pyramid levels plus the semantic feature —
    # share rois and chunking, so all of them run in ONE lax.scan: each
    # iteration contracts every level's band window for one 16-roi chunk and
    # sums in-body. vs one scan per level this cuts scan trip counts 3×,
    # drops two stacked (R, flat) intermediates per stage, and gives XLA one
    # fused loop body instead of three.
    specs = [
        (feats[lvl], 1.0 / strides[lvl], sampling_ratio, None)
        for lvl in range(start_level)
    ] + [(sem, 1.0 / strides[0], 0 if sem_pool_from else sampling_ratio, sem_pool_from)]

    plans, feats_t, bands = [], [], []
    oflow = jnp.zeros((r,), bool)
    for f, ss, sr, pf in specs:
        sy, sx, col0, row0, of, b_eff, yb_eff = banded_plan(
            f.shape, rois, ss, output_size, sampling_ratio=sr,
            max_grid=max_grid, chunk=chunk, band=band, pool_from=pf,
            yband=yband,
        )
        plans.append((sy, sx, col0, row0))
        feats_t.append(f.astype(cdtype).transpose(1, 0, 2))  # (W, H, C)
        bands.append((b_eff, yb_eff))
        oflow = oflow | of

    c = feats_t[0].shape[-1]
    flat = output_size * output_size * c
    n_chunks = plans[0][0].shape[0]

    # attention-pooled coarse levels: per-roi constants over the grid
    pooled = None
    for lvl in range(start_level, len(feats)):
        p = attention_pool(feats[lvl], rois, strides[lvl], thres)  # (R, C)
        pooled = p if pooled is None else pooled + p

    assert fc0_kernel is None or conv0_kernel is None
    if fc0_kernel is not None or conv0_kernel is not None:
        # complete each chunk's feature in-body and push it through the
        # folded head op (fc0 matmul or conv0 unfold-matmul) — the scan
        # emits post-op rows, never the (R, flat) activation
        pad = n_chunks * chunk - r
        if pooled is None:
            pooled = jnp.zeros((r, c), jnp.float32)
        pooled_c = jnp.pad(pooled.astype(jnp.float32), ((0, pad), (0, 0)))
        pooled_c = pooled_c.reshape(n_chunks, chunk, c)
        w0 = None if fc0_kernel is None else fc0_kernel.astype(cdtype)
        co = None if conv0_kernel is None else conv0_kernel.shape[-1]

        def body_fold(_, xs):
            *level_xs, p_c = xs
            acc = jnp.zeros((chunk, output_size * output_size, c), jnp.float32)
            for ft, (b_eff, yb_eff), (sy_c, sx_c, c0, r0) in zip(
                feats_t, bands, level_xs
            ):
                t2 = banded_chunk_t2(
                    ft, sy_c, sx_c, c0, b_eff, r0=r0, yband=yb_eff, cdtype=cdtype
                )
                acc = acc + t2.reshape(chunk, output_size * output_size, c)
            acc = acc + p_c[:, None, :]
            if w0 is not None:
                return None, jnp.dot(
                    acc.reshape(chunk, flat).astype(cdtype), w0,
                    preferred_element_type=jnp.float32,
                )
            y = conv3x3_same(
                acc.reshape(chunk, output_size, output_size, c),
                conv0_kernel, cdtype=cdtype,
            )
            return None, y.reshape(chunk, output_size * output_size * co)

        _, out = jax.lax.scan(body_fold, None, tuple(plans) + (pooled_c,))
        out = out.reshape(-1, out.shape[-1])[:r]  # (R, F|out²C') f32
    else:
        def body(_, xs):
            acc = jnp.zeros((chunk, flat), jnp.float32)
            for ft, (b_eff, yb_eff), (sy_c, sx_c, c0, r0) in zip(feats_t, bands, xs):
                t2 = banded_chunk_t2(
                    ft, sy_c, sx_c, c0, b_eff, r0=r0, yband=yb_eff, cdtype=cdtype
                )
                acc = acc + t2.reshape(chunk, flat)
            return None, acc.astype(dtype)

        _, out = jax.lax.scan(body, None, tuple(plans))
        out = out.reshape(-1, flat)[:r]  # (R, out*out*C), (i, j, c) order
        if pooled is not None:
            out = out + jnp.broadcast_to(
                pooled[:, None, :], (r, output_size * output_size, c)
            ).reshape(r, flat)

    if min(overflow_slots, r):
        k, slot, sel, idx = overflow_plan(oflow, overflow_slots)
        sub_rois = rois[jnp.minimum(idx, r - 1)]
        sub = attention_roi_features(
            feats, sub_rois, output_size, sampling_ratio, strides=strides,
            start_level=start_level, thres=thres, max_grid=max_grid,
        ) + single_roi_features(
            sem, sub_rois, output_size, stride=strides[0],
            sampling_ratio=0 if sem_pool_from else sampling_ratio,
            max_grid=max_grid, pool_from=sem_pool_from,
        )
        if fc0_kernel is not None:
            # repair in fc0-output space — exact by linearity
            sub = jnp.dot(
                sub.reshape(k, -1).astype(cdtype), w0,
                preferred_element_type=jnp.float32,
            )
        elif conv0_kernel is not None:
            sub = conv3x3_same(sub, conv0_kernel, cdtype=cdtype)
        sub = sub.reshape(k, -1)
        out = overflow_merge(out, slot, sel, sub)
    return out


def multilevel_roi_features(
    feats: Sequence[jnp.ndarray],  # per-level (H, W, C) for ONE image
    rois: jnp.ndarray,  # (R, 4)
    output_size: int,
    sampling_ratio: int = 0,
    strides: Sequence[int] = (4, 8, 16, 32),
    finest_scale: float = 56.0,
    max_grid: int = 8,
) -> jnp.ndarray:
    """SingleRoIExtractor with ``map_roi_levels`` (mmdet
    single_level_roi_extractor.py:36-55, used by the standalone MaskRCNN
    family): each RoI reads ONE pyramid level,
    lvl = clamp(floor(log2(sqrt(wh)/finest_scale + 1e-6)), 0, L-1).
    Computed as a masked sum over per-level RoIAlign — static shapes, no
    gathers; the 4× redundant compute is fine off the flagship path."""
    scale = jnp.sqrt(
        jnp.maximum(rois[:, 2] - rois[:, 0], 0.0) * jnp.maximum(rois[:, 3] - rois[:, 1], 0.0)
    )
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(strides) - 1).astype(jnp.int32)
    out = None
    for i, (feat, stride) in enumerate(zip(feats, strides)):
        t = roi_align(
            feat, rois, 1.0 / stride, output_size,
            sampling_ratio=sampling_ratio, max_grid=max_grid,
        )
        t = t * (lvl == i).astype(t.dtype)[:, None, None, None]
        out = t if out is None else out + t
    return out


def adaptive_avg_pool_grid(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """(R, S, S, C) → (R, out, out, C), torch adaptive_avg_pool2d semantics
    (here S is always an integer multiple of out: 14 → 7)."""
    r, s, _, c = x.shape
    assert s % out_size == 0, (s, out_size)
    f = s // out_size
    return x.reshape(r, out_size, f, out_size, f, c).mean(axis=(2, 4))
