"""Additional RoI extractors (reference nuhtc/models/roi_extractors_cus.py):

- SelectedRoIExtractor (:12): sum of RoIAlign over selected levels;
- LocalGlobalRoIExtractor (:94): RoIAlign on fine levels + global-average
  broadcast on coarse levels;
- PosAttentionRoIExtractor (:262): coarse levels pool an RoI-to-RoI
  cosine-similarity mix of the (detached) per-RoI center vectors.

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
    valid: Optional[jnp.ndarray] = None,  # (R,) bool — padding rois excluded
) -> jnp.ndarray:
    """Reference PosAttentionRoIExtractor coarse-level pooling
    (roi_extractors_cus.py:308-329): take each RoI's (detached) center-cell
    vector, form the RoI-to-RoI cosine-similarity matrix over UNIQUE center
    cells normalized by the unique count, and mix the center vectors with it:
    out_i = (1/U) Σ_unique_b cos(v_i, w_b) · w_b.

    The reference dedupes center cells dynamically (torch.unique); the
    static-shape equivalent weights every roi j by 1/multiplicity(cell_j),
    which reproduces the unique-space sums exactly (rois sharing a cell have
    identical vectors). Returns (R, C)."""
    h, w, c = feat.shape
    r = rois.shape[0]
    cx = jnp.clip(
        jnp.floor((rois[:, 0] + rois[:, 2]) / (2.0 * stride)), 0, w - 1
    ).astype(jnp.int32)
    cy = jnp.clip(
        jnp.floor((rois[:, 1] + rois[:, 3]) / (2.0 * stride)), 0, h - 1
    ).astype(jnp.int32)
    flat = feat.reshape(h * w, c).astype(jnp.float32)
    v = jax.lax.stop_gradient(flat[cy * w + cx])  # (R, C) center vectors

    ok = jnp.ones((r,), bool) if valid is None else valid.astype(bool)
    same_cell = (cx[:, None] == cx[None, :]) & (cy[:, None] == cy[None, :])
    same_cell = same_cell & ok[None, :]
    mult = jnp.maximum(jnp.sum(same_cell, axis=1), 1)  # (R,) cell multiplicity
    inv_m = jnp.where(ok, 1.0 / mult, 0.0)
    u = jnp.maximum(jnp.sum(inv_m), 1.0)  # number of unique cells

    norm = jnp.maximum(jnp.linalg.norm(v, axis=1), 1e-8)
    cos = (v @ v.T) / (norm[:, None] * norm[None, :])  # (R, R)
    out = (cos * inv_m[None, :]) @ v / u
    return out.astype(feat.dtype)
