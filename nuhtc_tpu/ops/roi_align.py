"""RoIAlign as separable interpolation matmuls (MXU-friendly, exact).

The reference uses mmcv-full's CUDA RoIAlign (`mmcv.ops.roi_align`, consumed
at reference nuhtc/models/roi_extractors_cus.py:51,218). Instead of a
gather-style kernel, we exploit the separability of bilinear sampling: for a
RoI, every pooled bin value is

    out[i, j] = (1 / (gh * gw)) * sum_{iy, ix} F(y(i, iy), x(j, ix))

with bilinear interpolation at each sample point. Folding the sample/bin
structure into per-RoI 1D interpolation matrices ``Sy (out_h, H)`` and
``Sx (out_w, W)`` gives ``out = Sy @ F @ Sx^T`` — two dense matmuls that map
straight onto the TPU MXU instead of scalar gathers.

Semantics match mmcv ``RoIAlign(aligned=True, pool_mode='avg')``:
- coordinates are scaled by ``spatial_scale`` then offset by -0.5;
- ``sampling_ratio > 0`` uses a fixed gh=gw=ratio grid; ``0`` means the
  adaptive ``ceil(roi_extent / out)`` grid (we cap it at ``max_grid``);
- out-of-range samples (y < -1 or y > H) contribute zero; borders clamp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(
    start: jnp.ndarray,  # (R,) roi start (feature coords, already offset)
    bin_size: jnp.ndarray,  # (R,)
    grid: jnp.ndarray,  # (R,) int samples per bin (≥1)
    out_size: int,
    size: int,  # feature extent (H or W)
    max_grid: int,
    dtype=jnp.float32,
    origin: jnp.ndarray | None = None,  # (R,) band start; None = full extent
    n_cols: int | None = None,  # band width; None = size
) -> jnp.ndarray:
    """Build (R, out_size, n_cols) interpolation matrices for one axis.

    With ``origin``/``n_cols``, column j of roi r maps to feature index
    ``origin[r] + j`` — a per-roi band of the full (R, out, size) matrix.
    Weights falling outside the band are silently dropped (the banded
    roi_align path detects and exactly repairs those rois)."""
    r = start.shape[0]
    if n_cols is None:
        n_cols = size
    i = jnp.arange(out_size, dtype=start.dtype)  # (out,)
    s = jnp.arange(max_grid, dtype=start.dtype)  # (max_grid,)

    gridf = grid.astype(start.dtype)[:, None, None]  # (R,1,1)
    # sample coordinate: start + i*bin + (s+0.5)*bin/grid
    y = (
        start[:, None, None]
        + i[None, :, None] * bin_size[:, None, None]
        + (s[None, None, :] + 0.5) * bin_size[:, None, None] / gridf
    )  # (R, out, max_grid)

    sample_w = (s[None, None, :] < gridf) / gridf  # (R, out, max_grid)

    # bilinear weights as a hat function: after CUDA-style clamping, the
    # weight of feature index h for sample y is max(0, 1 - |h - y|). This
    # fuses into the sum over samples — no one_hot materialization, no dot.
    out_of_range = (y < -1.0) | (y > size)
    yc = jnp.clip(y, 0.0, size - 1)
    at_border = jnp.floor(yc) >= size - 1
    yc = jnp.where(at_border, size - 1.0, yc)  # border: ly = 0
    w = jnp.where(out_of_range, 0.0, sample_w)

    h_idx = jnp.arange(n_cols, dtype=yc.dtype)  # (n_cols,)
    if origin is not None:
        h_idx = origin.astype(yc.dtype)[:, None, None, None] + h_idx
    else:
        h_idx = h_idx[None, None, None, :]
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(h_idx - yc[..., None]))
    mat = jnp.sum(hat * w[..., None], axis=2, dtype=jnp.float32)
    return mat.astype(dtype)  # (R, out, n_cols)


def _geometry(rois, spatial_scale, output_size, sampling_ratio, max_grid, pool_from):
    """Per-roi sampling geometry shared by the dense and banded paths.
    → (start_h, bin_h, grid_h, start_w, bin_w, grid_w, mg)."""
    r = rois.shape[0]
    rois = rois.astype(jnp.float32)
    start_w = rois[:, 0] * spatial_scale - 0.5
    start_h = rois[:, 1] * spatial_scale - 0.5
    roi_w = rois[:, 2] * spatial_scale - 0.5 - start_w
    roi_h = rois[:, 3] * spatial_scale - 0.5 - start_h
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    if pool_from is not None:
        # exact fusion of adaptive_avg_pool2d(RoIAlign(pool_from, sr=0), out):
        # pooling k×k bins of the fine grid equals sampling k·ceil(roi/pool_from)
        # points per coarse bin (identical sample set, see ops docstring) —
        # halves the t1 intermediate vs computing at pool_from resolution.
        assert pool_from % output_size == 0 and sampling_ratio == 0
        k = pool_from // output_size
        grid_h = (k * jnp.clip(jnp.ceil(roi_h / pool_from), 1, max_grid)).astype(jnp.int32)
        grid_w = (k * jnp.clip(jnp.ceil(roi_w / pool_from), 1, max_grid)).astype(jnp.int32)
        mg = k * max_grid
    elif sampling_ratio > 0:
        grid_h = jnp.full((r,), sampling_ratio, dtype=jnp.int32)
        grid_w = grid_h
        mg = sampling_ratio
    else:
        grid_h = jnp.clip(jnp.ceil(roi_h / output_size), 1, max_grid).astype(jnp.int32)
        grid_w = jnp.clip(jnp.ceil(roi_w / output_size), 1, max_grid).astype(jnp.int32)
        mg = max_grid
    return start_h, bin_h, grid_h, start_w, bin_w, grid_w, mg


def _band_window(start, bin_size, grid, output_size, size, band, n_chunks, chunk, pad):
    """Per-chunk band window along one axis: → (w0 (n_chunks,) i32 aligned
    window starts, w0_r (R,) per-roi, overflow (R,) bool).

    Conservative support: all samples lie in [start + half, start +
    out*bin - half]; after clipping, the hat of a sample at xc touches
    cells floor(xc) and floor(xc)+1. The window start is the min support
    cell over the chunk, sublane-aligned down (8), clamped in range —
    w0 <= lo for every roi in the chunk, so only the high side can
    overflow."""
    r = start.shape[0]
    gridf = grid.astype(jnp.float32)
    half = 0.5 * bin_size / gridf
    lo = jnp.clip(start + half, 0.0, size - 1.0)
    hi = jnp.clip(start + output_size * bin_size - half, 0.0, size - 1.0)
    lo_i = jnp.floor(lo)
    hi_i = jnp.minimum(jnp.floor(hi) + 1.0, size - 1.0)
    lo_pad = jnp.pad(lo_i, (0, pad), constant_values=float(size - 1))
    w0 = jnp.min(lo_pad.reshape(n_chunks, chunk), axis=1)
    w0 = (jnp.clip(w0, 0.0, float(size - band)) // 8 * 8).astype(jnp.int32)
    w0_r = jnp.repeat(w0, chunk)[:r]  # (R,)
    overflow = hi_i > (w0_r + band - 1).astype(jnp.float32)
    return w0, w0_r, overflow


def banded_plan(
    feat_shape: tuple,  # (H, W, C)
    rois: jnp.ndarray,  # (R, 4)
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    chunk: int = 16,
    band: int = 32,
    pool_from: int | None = None,
    yband: int | None = None,
):
    """Chunked banded interpolation inputs for one pyramid level.

    Returns (sy, sx, col0, row0, overflow, band_eff, yband_eff):
      sy (n_chunks, chunk, out, yband_eff) f32 — y-interp matrices
      sx (n_chunks, chunk, out, band_eff) f32 — x-interp matrices
      col0/row0 (n_chunks,) i32 — window start col/row per chunk (8-aligned)
      overflow (R,) bool — rois whose support exceeds their chunk window
      band_eff = min(band, W); yband_eff = min(yband, H) (or H when yband
      is None — x-banding only; a band equal to the extent degenerates to
      dense on that axis, no overflow)

    ``yband``: 2-d banding. With rois sorted by (y-stripe, x-center) — the
    caller's job — each chunk reads a (yband, band) feature window, cutting
    t1's contraction depth H -> yband on top of the x cut. RoIs whose y
    support exceeds the window union into the same overflow set.

    The caller owns the scan — this enables fusing several levels into one
    loop (roi_extractor.banded_stage_features)."""
    h, w, _ = feat_shape
    r = rois.shape[0]
    band = min(band, w)
    start_h, bin_h, grid_h, start_w, bin_w, grid_w, mg = _geometry(
        rois, spatial_scale, output_size, sampling_ratio, max_grid, pool_from
    )
    pad = (-r) % chunk
    n_chunks = (r + pad) // chunk

    col0, col0_r, overflow = _band_window(
        start_w, bin_w, grid_w, output_size, w, band, n_chunks, chunk, pad
    )
    sx = _interp_matrix(
        start_w, bin_w, grid_w, output_size, w, mg, dtype=jnp.float32,
        origin=col0_r, n_cols=band,
    )

    yband = min(yband, h) if yband is not None else h
    if yband < h:
        row0, row0_r, y_over = _band_window(
            start_h, bin_h, grid_h, output_size, h, yband, n_chunks, chunk, pad
        )
        overflow = overflow | y_over
        sy = _interp_matrix(
            start_h, bin_h, grid_h, output_size, h, mg, dtype=jnp.float32,
            origin=row0_r, n_cols=yband,
        )
    else:
        row0 = jnp.zeros((n_chunks,), jnp.int32)
        sy = _interp_matrix(start_h, bin_h, grid_h, output_size, h, mg, dtype=jnp.float32)

    sy = jnp.pad(sy, ((0, pad), (0, 0), (0, 0))).reshape(n_chunks, chunk, output_size, yband)
    sx = jnp.pad(sx, ((0, pad), (0, 0), (0, 0))).reshape(n_chunks, chunk, output_size, band)
    return sy, sx, col0, row0, overflow, band, yband


def banded_chunk_t2(
    feat_t: jnp.ndarray,  # (W, H, C) pre-transposed, compute dtype
    sy_c: jnp.ndarray,  # (chunk, out, yband)
    sx_c: jnp.ndarray,  # (chunk, out, band)
    c0: jnp.ndarray,  # scalar i32 x-window start
    band: int,
    r0: jnp.ndarray | None = None,  # scalar i32 y-window start (None = 0)
    yband: int | None = None,  # y-window height (None = full H)
    cdtype=jnp.bfloat16,
    prec=jax.lax.Precision.DEFAULT,
    t1_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One banded chunk: → (chunk, out, out, C) f32. t1 keeps the shared-F
    big-M structure (M = chunk*out, K = yband) with N cut to band*C; t2's K
    is band. feat_t's window is a (band, yband, C) dynamic_slice — the x cut
    is a contiguous major-dim slice, the y cut strides within it."""
    w, h, c = feat_t.shape
    if yband is None:
        yband = h
    z = jnp.int32(0)
    fb = jax.lax.dynamic_slice(
        feat_t, (c0, z if r0 is None else r0, z), (band, yband, c)
    )
    t1 = jnp.einsum(
        "rih,bhc->ribc", sy_c.astype(cdtype), fb,
        precision=prec, preferred_element_type=t1_dtype,
    )
    return jnp.einsum(
        "rjb,ribc->rijc", sx_c.astype(cdtype), t1.astype(cdtype),
        precision=prec, preferred_element_type=jnp.float32,
    )


def overflow_plan(overflow: jnp.ndarray, slots: int):
    """Repair bookkeeping shared by roi_align's banded branch and
    banded_stage_features: → (k, slot (R,), sel (R,), idx (k,)) where the
    first ``k`` overflowing rois (raster order of the flag) map to
    replacement slots; ``idx`` gathers their row indices (padding = R)."""
    r = overflow.shape[0]
    k = min(slots, r)
    slot = jnp.cumsum(overflow.astype(jnp.int32)) - 1  # (R,)
    sel = overflow & (slot < k)
    idx = jnp.nonzero(overflow, size=k, fill_value=r)[0]
    return k, slot, sel, idx


def overflow_merge(out, slot, sel, sub_flat, cdtype=None,
                   prec=jax.lax.Precision.DEFAULT):
    """Merge ``sub_flat`` (k, F) replacement rows into ``out`` (R, ...) via a
    one-hot matmul + select — scatters/gathers lower poorly on TPU, while an
    (R, k) one-hot dot is a trivially MXU-shaped copy that reproduces the
    replacement values exactly (one nonzero product per output row)."""
    k = sub_flat.shape[0]
    mdtype = cdtype or out.dtype
    onehot = (slot[:, None] == jnp.arange(k)[None, :]) & sel[:, None]
    repair = jnp.einsum(
        "rk,kf->rf", onehot.astype(mdtype), sub_flat.astype(mdtype),
        precision=prec, preferred_element_type=jnp.float32,
    ).astype(out.dtype).reshape(out.shape)
    selb = sel.reshape(sel.shape + (1,) * (out.ndim - 1))
    return jnp.where(selb, repair, out)


@partial(
    jax.jit,
    static_argnames=(
        "output_size", "sampling_ratio", "max_grid", "chunk", "exact", "pool_from",
        "unroll", "band", "overflow_slots", "return_overflow", "flat_output",
    ),
)
def roi_align(
    feat: jnp.ndarray,  # (H, W, C) single image, NHWC layout sans batch
    rois: jnp.ndarray,  # (R, 4) [x1, y1, x2, y2] in image coords
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    chunk: int = 16,
    exact: bool = False,
    pool_from: int | None = None,
    unroll: int = 1,  # >1 multiplies live t1 buffers — VMEM spill at 512²/B16
    band: int | None = None,  # x-band width (cols of W per chunk); None = dense
    overflow_slots: int = 128,  # exact full-W repair capacity for wide rois
    return_overflow: bool = False,  # return (out, overflow flags), skip repair
    flat_output: bool = False,  # (banded only) emit (R, out*out*C), (i,j,c) order
) -> jnp.ndarray:
    """RoIAlign for one image. Returns (R, out, out, C).

    Invalid/padding rois are harmless (produce garbage rows the caller masks).
    vmap over the leading batch axis for batched use.

    ``band``: x-banded mode. The dense formulation's cost is dominated by the
    first contraction t1 = Sy @ F with N = W*C — every roi pays for the full
    feature width although its bilinear support spans only ~roi_w/stride + 2
    columns. With rois sorted by x-center (caller's job), each 16-roi chunk
    reads one ``band``-column window of F (dynamic_slice at a sublane-aligned
    start), cutting t1's N and t2's K by W/band at unchanged MXU efficiency.
    RoIs whose support exceeds their chunk's window (wide boxes, unsorted
    callers) are detected exactly and recomputed dense through
    ``overflow_slots`` replacement slots — the result equals the dense path
    up to f32 accumulation order whenever ≤ overflow_slots rois overflow
    (guaranteed for any input when overflow_slots == R). Overflowing rois
    beyond the slot capacity keep their banded (x-clipped) features.
    """
    h, w, c = feat.shape
    r = rois.shape[0]
    dtype = feat.dtype

    rois_in = rois
    banded = band is not None and band < w and r > chunk and not exact

    # The feature contractions are the hot path: bf16 on the MXU with f32
    # accumulation by default; ``exact=True`` keeps everything f32 (for
    # parity tests). bf16 input rounding costs ~0.4% relative — the reference
    # itself returns RoI features in fp16 (roi_extractors_cus.py force_fp32
    # out_fp16=True).
    if exact:
        cdtype, prec = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        cdtype, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    featc = feat.astype(cdtype)

    t1_type = jnp.float32 if exact else jnp.bfloat16  # halve t1 HBM traffic

    if banded:
        # scan over chunks; each reads one band-column window of F (see
        # banded_plan / banded_chunk_t2). F is pre-transposed to (W, H, C) so
        # the window is a contiguous major-dim slice (loop-invariant, hoisted).
        sy_p, sx_p, col0, _row0, overflow, band, _yb = banded_plan(
            feat.shape, rois_in, spatial_scale, output_size,
            sampling_ratio=sampling_ratio, max_grid=max_grid, chunk=chunk,
            band=band, pool_from=pool_from,
        )
        feat_t = featc.transpose(1, 0, 2)  # (W, H, C)

        def one_banded(args):
            sy_c, sx_c, c0 = args
            t2 = banded_chunk_t2(
                feat_t, sy_c, sx_c, c0, band,
                cdtype=cdtype, prec=prec, t1_dtype=t1_type,
            )
            # cast in-body: keeps the stacked scan output (and every layout
            # copy downstream) at the narrow dtype instead of f32
            t2 = t2.astype(dtype)
            if flat_output:
                # flatten (i, j, c) in-body (cheap VMEM repack per chunk) so
                # the stacked scan output is clean (R, 3136)-row tiles — the
                # post-hoc relayout of [chunks,chunk,7,7,64] into head-ready
                # rows cost ~15 ms/step at B16 (measured)
                t2 = t2.reshape(chunk, output_size * output_size * c)
            return t2

        _, out = jax.lax.scan(
            lambda _, args: (None, one_banded(args)), None, (sy_p, sx_p, col0)
        )
        if flat_output:
            out = out.reshape(-1, output_size * output_size * c)[:r]
        else:
            out = out.reshape(-1, output_size, output_size, c)[:r]
        if return_overflow:
            # caller handles repair (e.g. one union repair over summed levels
            # — roi_extractor.banded_stage_features)
            return out.astype(dtype), overflow
        if overflow_slots:
            # exact repair: recompute overflowing rois through the dense path
            # and merge the replacements (overflow_plan/overflow_merge)
            k, slot, sel, idx = overflow_plan(overflow, overflow_slots)
            sub_rois = rois_in[jnp.minimum(idx, r - 1)]
            sub = roi_align(
                feat, sub_rois, spatial_scale, output_size,
                sampling_ratio=sampling_ratio, max_grid=max_grid, chunk=chunk,
                exact=exact, pool_from=pool_from, unroll=unroll,
            )
            out = overflow_merge(out, slot, sel, sub.reshape(k, -1),
                                 cdtype=cdtype, prec=prec)
        return out.astype(dtype)

    start_h, bin_h, grid_h, start_w, bin_w, grid_w, mg = _geometry(
        rois_in, spatial_scale, output_size, sampling_ratio, max_grid, pool_from
    )
    # The interpolation matrices are cheap — build them exactly (f32).
    sy = _interp_matrix(start_h, bin_h, grid_h, output_size, h, mg, dtype=jnp.float32)
    sx = _interp_matrix(start_w, bin_w, grid_w, output_size, w, mg, dtype=jnp.float32)

    def one_chunk(args):
        sy_c, sx_c = args  # (chunk, out, H), (chunk, out, W)
        t1 = jnp.einsum(
            "rih,hwc->riwc", sy_c.astype(cdtype), featc,
            precision=prec, preferred_element_type=t1_type,
        )
        t2 = jnp.einsum(
            "rjw,riwc->rijc", sx_c.astype(cdtype), t1.astype(cdtype),
            precision=prec, preferred_element_type=jnp.float32,
        )
        return t2

    if r <= chunk:
        out = one_chunk((sy, sx))
    else:
        pad = (-r) % chunk
        sy_p = jnp.pad(sy, ((0, pad), (0, 0), (0, 0)))
        sx_p = jnp.pad(sx, ((0, pad), (0, 0), (0, 0)))
        n_chunks = sy_p.shape[0] // chunk
        sy_p = sy_p.reshape(n_chunks, chunk, output_size, h)
        sx_p = sx_p.reshape(n_chunks, chunk, output_size, w)
        # unrolled scan: chunking keeps t1 in VMEM, unrolling amortizes the
        # TPU loop overhead (~15µs/iter measured on v5e) over several chunks
        _, out = jax.lax.scan(
            lambda _, args: (None, one_chunk(args)),
            None,
            (sy_p, sx_p),
            unroll=min(unroll, n_chunks),
        )
        out = out.reshape(-1, output_size, output_size, c)[:r]
    if flat_output:
        out = out.reshape(r, output_size * output_size * c)
    if return_overflow:  # dense path never overflows
        return out.astype(dtype), jnp.zeros((r,), bool)
    return out.astype(dtype)


def attention_pool(
    feat: jnp.ndarray,  # (H, W, C) single image
    rois: jnp.ndarray,  # (R, 4)
    stride: int,
    thres: float,
    eps: float = 1e-8,
    exact: bool = False,
) -> jnp.ndarray:
    """Cosine-similarity attention pooling used by AttentionRoIExtractor for
    coarse levels (reference nuhtc/models/roi_extractors_cus.py:216-245).

    Takes the feature vector at each RoI's center cell, computes a ReLU-
    thresholded cosine-similarity map against the whole level, and returns
    the similarity-weighted spatial mean ``mean_hw(feat * sim)`` per RoI:
    (R, C). The caller broadcasts to (R, out, out, C).

    Gradients do not flow through the similarity weights (the reference
    detaches both the center vector and the level map before the similarity).
    """
    h, w, c = feat.shape
    # center cell: floor((x1+x2) / (2*stride)), clamped
    cx = jnp.clip(
        jnp.floor((rois[:, 0] + rois[:, 2]) / (2.0 * stride)), 0, w - 1
    ).astype(jnp.int32)
    cy = jnp.clip(
        jnp.floor((rois[:, 1] + rois[:, 3]) / (2.0 * stride)), 0, h - 1
    ).astype(jnp.int32)

    featf = feat.astype(jnp.float32)
    flat = featf.reshape(h * w, c)
    center = flat[cy * w + cx]  # (R, C)
    center = jax.lax.stop_gradient(center)
    flat_sg = jax.lax.stop_gradient(flat)

    # cosine similarity, torch eps semantics: dot / max(|a|*|b|, eps).
    # bf16 matmuls with f32 accumulation — the reference itself computes this
    # in fp16 on GPU (roi_extractors_cus.py roi_dtype = float16 when cuda).
    mdtype = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    dots = jnp.einsum(
        "nc,rc->nr", flat_sg.astype(mdtype), center.astype(mdtype),
        precision=prec, preferred_element_type=jnp.float32,
    )
    norms = jnp.linalg.norm(flat_sg, axis=1)  # (HW,)
    cnorm = jnp.linalg.norm(center, axis=1)  # (R,)
    denom = jnp.maximum(norms[:, None] * cnorm[None, :], eps)
    sim = dots / denom
    sim = jax.nn.relu(sim - thres) + thres  # (HW, R)

    pooled = (
        jnp.einsum(
            "nc,nr->cr", flat.astype(mdtype), sim.astype(mdtype),
            precision=prec, preferred_element_type=jnp.float32,
        ) / (h * w)
    )
    return pooled.T.astype(feat.dtype)  # (R, C)
