"""Additional RoI extractors (reference nuhtc/models/roi_extractors_cus.py):

- SelectedRoIExtractor (:12): sum of RoIAlign over selected levels;
- LocalGlobalRoIExtractor (:94): RoIAlign on fine levels + global-average
  broadcast on coarse levels;
- PosAttentionRoIExtractor (:262): AttentionRoIExtractor with a positional
  gaussian prior multiplied into the similarity map.

Pure functions over per-image NHWC pyramids (like attention_roi_features).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from nuhtc_tpu.ops.roi_align import roi_align, attention_pool


def selected_roi_features(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int,
    strides: Sequence[int] = (4, 8, 16, 32),
    selected_levels: Optional[Sequence[int]] = None,
    max_grid: int = 8,
) -> jnp.ndarray:
    levels = selected_levels if selected_levels is not None else range(len(feats))
    out = None
    for lvl in levels:
        t = roi_align(
            feats[lvl], rois, 1.0 / strides[lvl], output_size,
            sampling_ratio=sampling_ratio, max_grid=max_grid,
        )
        out = t if out is None else out + t
    return out


def local_global_roi_features(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int,
    strides: Sequence[int] = (4, 8, 16, 32),
    start_level: int = 2,
    max_grid: int = 8,
) -> jnp.ndarray:
    out = None
    for lvl, (feat, stride) in enumerate(zip(feats, strides)):
        if lvl < start_level:
            t = roi_align(feat, rois, 1.0 / stride, output_size,
                          sampling_ratio=sampling_ratio, max_grid=max_grid)
        else:
            g = jnp.mean(feat, axis=(0, 1))  # (C,) global average
            t = jnp.broadcast_to(
                g[None, None, None, :],
                (rois.shape[0], output_size, output_size, g.shape[-1]),
            )
        out = t if out is None else out + t
    return out


def pos_attention_pool(
    feat: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,
    stride: int,
    thres: float,
    sigma_scale: float = 0.5,
) -> jnp.ndarray:
    """Attention pooling with a per-RoI gaussian positional prior centered on
    the box (reference PosAttentionRoIExtractor)."""
    h, w, c = feat.shape
    base = attention_pool(feat, rois, stride, thres)  # (R, C) — reuse machinery
    # positional prior
    cx = (rois[:, 0] + rois[:, 2]) / (2.0 * stride)
    cy = (rois[:, 1] + rois[:, 3]) / (2.0 * stride)
    sx = jnp.maximum((rois[:, 2] - rois[:, 0]) / stride * sigma_scale, 1.0)
    sy = jnp.maximum((rois[:, 3] - rois[:, 1]) / stride * sigma_scale, 1.0)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy = jnp.exp(-0.5 * ((ys[None, :] - cy[:, None]) / sy[:, None]) ** 2)  # (R, H)
    gx = jnp.exp(-0.5 * ((xs[None, :] - cx[:, None]) / sx[:, None]) ** 2)  # (R, W)
    prior = gy[:, :, None] * gx[:, None, :]  # (R, H, W)
    weighted = jnp.einsum(
        "rhw,hwc->rc", prior.astype(feat.dtype), feat,
        preferred_element_type=jnp.float32,
    ) / (h * w)
    return (base + weighted).astype(feat.dtype)
