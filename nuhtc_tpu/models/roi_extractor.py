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

from nuhtc_tpu.ops.roi_align import roi_align, attention_pool


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
) -> jnp.ndarray:
    """→ (R, out, out, C). vmap over the batch axis for batched use.
    ``exact=True`` forces f32/HIGHEST internals (parity testing)."""
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
            )
        else:
            pooled = attention_pool(feat, rois, stride, thres, exact=exact)  # (R, C)
            t = jnp.broadcast_to(
                pooled[:, None, None, :],
                (rois.shape[0], output_size, output_size, pooled.shape[-1]),
            )
        out = t if out is None else out + t
    return out


def single_roi_features(
    feat: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,
    output_size: int,
    stride: int = 4,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    pool_from: int | None = None,
    exact: bool = False,
) -> jnp.ndarray:
    return roi_align(
        feat, rois, 1.0 / stride, output_size, sampling_ratio=sampling_ratio,
        max_grid=max_grid, pool_from=pool_from, exact=exact,
    )


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
