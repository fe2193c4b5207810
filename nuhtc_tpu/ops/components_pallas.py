"""Pallas TPU kernel for component box/area extraction.

``boxes_from_roots`` (ops/components.py) is the hot tail of the device
watershed-proposal path (reference nuhtc/models/htc_roi_head_cus.py:284-342
runs this on host scipy): given the raw CCL label map and K component ids it
reduces five per-component stats (x/y extents + area). The XLA lowering
materializes three (B, K, H)-row aggregates in HBM across separate fusions
(~7 ms/step at B16·512²·K512 on v5e).

This kernel keeps the label map row-block in VMEM and accumulates ALL five
stats in one pass: grid (B, H/RB); the (1, K) output rows live in VMEM
across the whole row sweep (constant index_map → no HBM round-trips), and
each step compares an (RB, W) label block against the K ids row-by-row
(2-d (KB, W) compares — VPU-shaped, no 3-d broadcasts for Mosaic to chew
on). Exact same semantics as the XLA path: stats are computed over
``lab == root`` pixels; ids that never match produce +/-BIG extents and
area 0 (the caller masks by validity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BIG = 1e9


def _make_kernel(k, kb, rb, w, n_rb):
    # roots/stat refs are (1, 1, K): Mosaic requires the last two block dims
    # be (8, 128)-divisible OR equal the array's — a (1, K) block over the
    # batched (B, K) array violates that, while (1, 1, K) over (B, 1, K)
    # matches both trailing dims exactly.
    def kernel(lab_ref, roots_ref, xmin_ref, xmax_ref, ymin_ref, ymax_ref, area_ref):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            xmin_ref[...] = jnp.full((1, 1, k), BIG, jnp.float32)
            xmax_ref[...] = jnp.full((1, 1, k), -BIG, jnp.float32)
            ymin_ref[...] = jnp.full((1, 1, k), BIG, jnp.float32)
            ymax_ref[...] = jnp.full((1, 1, k), -BIG, jnp.float32)
            area_ref[...] = jnp.zeros((1, 1, k), jnp.float32)

        lab = lab_ref[0]  # (RB, W) i32
        y0 = step * rb
        for kb0 in range(0, k, kb):
            roots = roots_ref[0, 0, kb0 : kb0 + kb]  # (KB,)
            xmin = xmin_ref[0, 0, kb0 : kb0 + kb]
            xmax = xmax_ref[0, 0, kb0 : kb0 + kb]
            ymin = ymin_ref[0, 0, kb0 : kb0 + kb]
            ymax = ymax_ref[0, 0, kb0 : kb0 + kb]
            area = area_ref[0, 0, kb0 : kb0 + kb]
            for r in range(rb):
                row = lab[r]  # (W,)
                eq = row[None, :] == roots[:, None]  # (KB, W) bool
                xs = jax.lax.broadcasted_iota(jnp.int32, (kb, w), 1).astype(
                    jnp.float32
                )
                rxmin = jnp.min(jnp.where(eq, xs, BIG), axis=1)  # (KB,)
                rxmax = jnp.max(jnp.where(eq, xs, -BIG), axis=1)
                rcnt = jnp.sum(eq.astype(jnp.float32), axis=1)
                yrow = jnp.float32(y0 + r)
                any_ = rcnt > 0
                xmin = jnp.minimum(xmin, rxmin)
                xmax = jnp.maximum(xmax, rxmax)
                ymin = jnp.minimum(ymin, jnp.where(any_, yrow, BIG))
                ymax = jnp.maximum(ymax, jnp.where(any_, yrow, -BIG))
                area = area + rcnt
            xmin_ref[0, 0, kb0 : kb0 + kb] = xmin
            xmax_ref[0, 0, kb0 : kb0 + kb] = xmax
            ymin_ref[0, 0, kb0 : kb0 + kb] = ymin
            ymax_ref[0, 0, kb0 : kb0 + kb] = ymax
            area_ref[0, 0, kb0 : kb0 + kb] = area

    return kernel


@partial(jax.jit, static_argnames=("row_block", "interpret"))
def boxes_from_roots_pallas(
    lab: jnp.ndarray,  # (H, W) i32 raw labels
    roots: jnp.ndarray,  # (K,) i32 component ids (padding = out-of-range)
    row_block: int = 8,
    interpret: bool = False,
):
    """→ (boxes (K, 4) [x1, y1, x2+1, y2+1] f32, areas (K,) i32) — same
    contract as components.boxes_from_roots. K must be a multiple of 128
    (pad the ids with an out-of-range value)."""
    boxes, areas = boxes_from_roots_pallas_batched(
        lab[None], roots[None], row_block=row_block, interpret=interpret
    )
    return boxes[0], areas[0]


@partial(jax.jit, static_argnames=("row_block", "interpret"))
def boxes_from_roots_pallas_batched(
    lab: jnp.ndarray,  # (B, H, W) i32 raw labels
    roots: jnp.ndarray,  # (B, K) i32 component ids (padding = out-of-range)
    row_block: int = 8,
    interpret: bool = False,
):
    """Batched single-pass stats: → (boxes (B, K, 4), areas (B, K) i32).

    The batch rides the FIRST grid dimension — ONE pallas_call covers all B
    images, so Mosaic pipelines row-block DMAs across the whole batch. (The
    round-4 in-model loss of the per-image kernel came from vmap serializing
    B=16 separate pallas_calls while the XLA path fused across the batch —
    BASELINE.md.) Grid iterates row-major (row-sweep j fastest), so the
    ``step == 0`` init fires once per image and the (1, K) stat rows stay
    VMEM-resident for that image's whole sweep."""
    b, h, w = lab.shape
    _, k = roots.shape
    assert k % 128 == 0 and h % row_block == 0, (k, h, row_block)
    n_rb = h // row_block
    kern = _make_kernel(k, min(k, 128), row_block, w, n_rb)

    outs = pl.pallas_call(
        kern,
        grid=(b, n_rb),
        in_specs=[
            pl.BlockSpec((1, row_block, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0))] * 5,
        out_shape=[jax.ShapeDtypeStruct((b, 1, k), jnp.float32)] * 5,
        interpret=interpret,
    )(lab, roots.astype(jnp.int32)[:, None, :])
    xmin, xmax, ymin, ymax, area = (o[:, 0, :] for o in outs)
    boxes = jnp.stack([xmin, ymin, xmax + 1.0, ymax + 1.0], axis=-1)
    return boxes, area.astype(jnp.int32)
