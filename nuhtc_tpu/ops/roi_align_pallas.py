"""EXPERIMENTAL Pallas TPU RoIAlign — not wired into the detector.

Status (v5e via axon, B16×P1512): compiles and runs after working around
Mosaic constraints (int iota only, 128-aligned reshape minors, 16-aligned
W-offsets for HBM DMA slices, SMEM row padding), but is currently
(a) numerically wrong (suspected DMA wait/slot bookkeeping) and (b) not
faster than the dense path — the per-RoI DMA is latency-bound (~24k small
DMAs) and channel padding to 128 + x-alignment margin inflates window bytes
12× over the ideal. Kept for future rounds; the production path is
ops/roi_align.py (dense interpolation matmuls).

Design: per-RoI window DMA + in-VMEM interpolation matmuls.

The dense XLA formulation (ops/roi_align.py) is bound by the t1 intermediate
(R·out·W·C written+read through HBM ≈ 11 GB per semantic extraction at
B16×P1512 — measured ~38 ms). Here each grid step DMAs CROP×CROP×C windows
for a block of RoIs into VMEM (double-buffered against compute), builds the
1-D hat interpolation matrices in-register, and runs the two small matmuls
entirely in VMEM. HBM traffic drops to the crop windows themselves.

Batch is folded into the kernel grid (no vmap over scalar-prefetch). RoIs
whose extent exceeds the window go through the dense path on a fixed
per-image budget and are merged back — nuclei RoIs are far smaller than the
window, so the budget is generous.

Semantics: mmcv RoIAlign(aligned=True, avg), identical to ops.roi_align.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nuhtc_tpu.ops.roi_align import roi_align as roi_align_dense


def _make_kernel(out_size, crop, crop_x, c, rpb, max_grid, feat_h, feat_w, n_blocks):
    def kernel(origins_ref, params_ref, feat_hbm, out_ref, crop_buf, sems):
        b = pl.program_id(0)
        slot = jax.lax.rem(b, 2)
        nslot = jax.lax.rem(b + 1, 2)

        def start_block_dma(blk, slot_idx):
            for p in range(rpb):
                r = blk * rpb + p
                bi = origins_ref[0, r]
                y0 = origins_ref[1, r]
                x0 = pl.multiple_of(origins_ref[2, r], 16)
                pltpu.make_async_copy(
                    feat_hbm.at[bi, pl.ds(y0, crop), pl.ds(x0, crop_x), :],
                    crop_buf.at[slot_idx, p],
                    sems.at[slot_idx, p],
                ).start()

        @pl.when(b == 0)
        def _():
            start_block_dma(0, 0)

        @pl.when(b + 1 < n_blocks)
        def _():
            start_block_dma(b + 1, nslot)

        for p in range(rpb):
            pltpu.make_async_copy(
                feat_hbm.at[0, pl.ds(0, crop), pl.ds(0, crop_x), :],  # shape only
                crop_buf.at[slot, p],
                sems.at[slot, p],
            ).wait()

        # ---- hat interpolation matrices (rpb, out, crop) -------------------
        # params: start_h, start_w, bin_h, bin_w, grid_h, grid_w, y0, x0
        prm = params_ref[:]  # (rpb, 8) f32
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (rpb, out_size, max_grid), 1).astype(jnp.float32)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (rpb, out_size, max_grid), 2).astype(jnp.float32)
        ky_idx = jax.lax.broadcasted_iota(jnp.int32, (rpb, out_size, max_grid, crop), 3).astype(jnp.float32)
        kx_idx = jax.lax.broadcasted_iota(jnp.int32, (rpb, out_size, max_grid, crop_x), 3).astype(jnp.float32)

        def axis_mat(start, bin_sz, grid, origin, size, k_idx):
            gridf = jnp.maximum(grid, 1.0)[:, None, None]
            y = start[:, None, None] + i_idx * bin_sz[:, None, None] + (
                s_idx + 0.5
            ) * bin_sz[:, None, None] / gridf
            wgt = jnp.where(s_idx < gridf, 1.0 / gridf, 0.0)
            oor = (y < -1.0) | (y > size)
            yc = jnp.clip(y, 0.0, size - 1.0)
            at_border = jnp.floor(yc) >= size - 1.0
            yc = jnp.where(at_border, size - 1.0, yc)
            wgt = jnp.where(oor, 0.0, wgt)
            y_rel = yc - origin[:, None, None]
            hat = jnp.maximum(0.0, 1.0 - jnp.abs(k_idx - y_rel[..., None]))
            return jnp.sum(hat * wgt[..., None], axis=2)  # (rpb, out, crop)

        sy = axis_mat(prm[:, 0], prm[:, 2], prm[:, 4], prm[:, 6], float(feat_h), ky_idx)
        sx = axis_mat(prm[:, 1], prm[:, 3], prm[:, 5], prm[:, 7], float(feat_w), kx_idx)

        # per-roi 2D matmuls — Mosaic supports reshapes only on 128-aligned
        # minors, so channels are pre-padded to 128 and each roi is a small
        # (out×crop)@(crop×crop·128) dot pair with a transpose in between
        for p in range(rpb):
            data_p = crop_buf[slot, p].astype(jnp.float32)  # (crop, crop_x, c)
            t1 = jax.lax.dot_general(
                sy[p], data_p.reshape(crop, crop_x * c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (out, crop_x*c)
            t1 = t1.reshape(out_size, crop_x, c).transpose(1, 0, 2)
            t2 = jax.lax.dot_general(
                sx[p], t1.reshape(crop_x, out_size * c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (out, out*c)
            out_ref[p] = t2.reshape(out_size, out_size, c)

    return kernel


@partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "max_grid", "crop", "rpb", "big_budget"),
)
def roi_align_pallas_batched(
    feat: jnp.ndarray,  # (B, H, W, C)
    rois: jnp.ndarray,  # (B, R, 4) image coords
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    crop: int = 32,
    rpb: int = 8,
    big_budget: int = 64,
) -> jnp.ndarray:
    """→ (B, R, out, out, C) f32-accumulated, cast to feat dtype."""
    bsz, h, w, c_in = feat.shape
    r = rois.shape[1]
    # Mosaic layout ops need a 128-aligned channel minor
    c = ((c_in + 127) // 128) * 128
    if c != c_in:
        feat_k = jnp.pad(feat, ((0, 0), (0, 0), (0, 0), (0, c - c_in)))
    else:
        feat_k = feat
    roif = rois.reshape(-1, 4).astype(jnp.float32)
    n = roif.shape[0]
    pad_n = (-n) % rpb
    roif = jnp.pad(roif, ((0, pad_n), (0, 0)))
    np_ = roif.shape[0]
    n_blocks = np_ // rpb

    start_w = roif[:, 0] * spatial_scale - 0.5
    start_h = roif[:, 1] * spatial_scale - 0.5
    roi_w = roif[:, 2] * spatial_scale - 0.5 - start_w
    roi_h = roif[:, 3] * spatial_scale - 0.5 - start_h
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    if sampling_ratio > 0:
        grid_h = jnp.full((np_,), float(sampling_ratio))
        grid_w = grid_h
        mg = sampling_ratio
    else:
        grid_h = jnp.clip(jnp.ceil(roi_h / output_size), 1, max_grid)
        grid_w = jnp.clip(jnp.ceil(roi_w / output_size), 1, max_grid)
        mg = max_grid

    # W offsets must be tile-aligned for HBM DMA slicing (8 sublanes x 2 bf16
    # packing = 16) — align down and widen the window to keep the margin
    crop_x = crop + 16
    y0 = jnp.clip(jnp.floor(start_h) - 1, 0, max(h - crop, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(start_w) - 1, 0, max(w - crop_x, 0)).astype(jnp.int32)
    x0 = (x0 // 16) * 16
    bi = jnp.pad(
        jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), r), (0, pad_n)
    )
    origins = jnp.stack([bi, y0, x0], axis=0)  # (3, N): SMEM pads rows to 128 lanes

    params = jnp.stack(
        [start_h, start_w, bin_h, bin_w, grid_h, grid_w,
         y0.astype(jnp.float32), x0.astype(jnp.float32)],
        axis=1,
    )

    kernel = _make_kernel(output_size, crop, crop_x, c, rpb, mg, h, w, n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rpb, 8), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # feat stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (rpb, output_size, output_size, c), lambda b, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rpb, crop, crop_x, c), feat_k.dtype),
            pltpu.SemaphoreType.DMA((2, rpb)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, output_size, output_size, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=os.environ.get("NUHTC_PALLAS_INTERPRET", "0") == "1",
    )(origins, params, feat_k)
    out = out[:n, :, :, :c_in].reshape(bsz, r, output_size, output_size, c_in)

    # ---- dense fallback for RoIs larger than the window -------------------
    if big_budget > 0:
        extent = jnp.maximum(roi_w[:n], roi_h[:n]).reshape(bsz, r)
        big = extent > (crop - 3.0)
        k = min(big_budget, r)

        def per_image(feat_i, rois_i, big_i, ext_i):
            _, idx = jax.lax.top_k(jnp.where(big_i, ext_i, -1.0), k)
            dense = roi_align_dense(
                feat_i, rois_i[idx], spatial_scale, output_size,
                sampling_ratio=sampling_ratio, max_grid=max_grid, chunk=min(k, 128),
            ).astype(jnp.float32)
            return idx, dense, big_i[idx]

        idxs, denses, flags = jax.vmap(per_image)(feat, rois, big, extent)
        upd = jnp.where(flags[..., None, None, None], denses,
                        jnp.take_along_axis(out, idxs[:, :, None, None, None], axis=1))
        out = jax.vmap(lambda o, i, u: o.at[i].set(u))(out, idxs, upd)
    return out.astype(feat.dtype)
