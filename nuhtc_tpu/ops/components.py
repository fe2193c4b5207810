"""Connected components + component boxes on device, static-shape.

The reference computes "watershed proposals" on host CPU mid-forward
(scipy EDT + skimage watershed, reference nuhtc/models/htc_roi_head_cus.py:
284-342). In the shipped configuration (``seg_head=None``, ``thres=0``) that
pipeline degenerates exactly to **connected components** of the opened,
hole-filled semantic mask: the EDT of a binary mask is ≥1 on every foreground
pixel, so ``distance > 0.25`` is the mask itself, the markers cover every
component entirely, and the watershed flood is the identity. We therefore
implement the proposal branch as a device-side 4-connected labeling.

TPU design notes (measured on v5e):
- random gathers over the full map cost ~10 ms each and
  ``lax.associative_scan`` lowers poorly — so propagation is pure shift-based
  min over 4-neighbors (contiguous slices, VPU-friendly), unrolled ``inner``
  steps per while-loop round;
- label compaction avoids gathers entirely: component roots (pixels whose
  label equals their own linear index) are extracted with one ``top_k`` and
  boxes/areas come from fused masked reductions against the root ids.
- convergence is bounded (``max_iters * inner`` total shifts); nuclei-scale
  blobs converge in <100 shifts. Pathological percolating shapes beyond the
  bound get split labels (each split is still a consistent component subset).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


def _propagate_min(lab: jnp.ndarray, mask: jnp.ndarray, big, inner: int) -> jnp.ndarray:
    """``inner`` rounds of 4-neighbor min propagation (shift-based)."""

    def one(l):
        up = jnp.pad(l[1:, :], ((0, 1), (0, 0)), constant_values=big)
        down = jnp.pad(l[:-1, :], ((1, 0), (0, 0)), constant_values=big)
        left = jnp.pad(l[:, 1:], ((0, 0), (0, 1)), constant_values=big)
        right = jnp.pad(l[:, :-1], ((0, 0), (1, 0)), constant_values=big)
        neigh = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(mask, jnp.minimum(l, neigh), big)

    for _ in range(inner):
        lab = one(lab)
    return lab


def _shift_i32(x: jnp.ndarray, k: int, axis: int, rev: bool, fill) -> jnp.ndarray:
    """x'[i] = x[i-k] (or x[i+k] if rev) along ``axis``, fill-padded."""
    if axis == 0:
        if rev:
            return jnp.pad(x[k:, :], ((0, k), (0, 0)), constant_values=fill)
        return jnp.pad(x[:-k, :], ((k, 0), (0, 0)), constant_values=fill)
    if rev:
        return jnp.pad(x[:, k:], ((0, 0), (0, k)), constant_values=fill)
    return jnp.pad(x[:, :-k], ((0, 0), (k, 0)), constant_values=fill)


def _sweep_min(v: jnp.ndarray, allowed: jnp.ndarray, axis: int, rev: bool, big) -> jnp.ndarray:
    """Segmented MIN scan (Hillis-Steele doubling) along one direction: after
    the sweep each pixel holds the min of v over its contiguous ``allowed``
    run up to itself. log2(n) shift steps — covers whole straight runs at
    once, vs one pixel per step for 4-neighbor propagation. (The OR variant
    for flood fill lives in morphology._sweep_or; they share _shift_bool.)"""
    from nuhtc_tpu.ops.morphology import _shift_bool

    n = v.shape[axis]
    run = allowed & _shift_bool(allowed, 1, axis, rev)
    k = 1
    while k < n:
        v = jnp.minimum(v, jnp.where(run, _shift_i32(v, k, axis, rev, big), big))
        run = run & _shift_bool(run, k, axis, rev)
        k *= 2
    return v


def label_components_raw(
    mask: jnp.ndarray, max_iters: int = 24, inner: int = 8, scan_rounds: int = 2
) -> jnp.ndarray:
    """Labels = min linear index of each 4-connected component (bg = H*W).

    Init: ``scan_rounds`` rounds of 4 directional segmented min-scans (each
    covers whole straight runs in log steps — blob-shaped components converge
    here). Refinement: shift-based 4-neighbor min propagation in a while loop
    to the exact fixpoint (handles spirals/concavities the scans miss)."""
    h, w = mask.shape
    mask = mask.astype(bool)
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(mask, idx, big)

    for _ in range(scan_rounds):
        for axis, rev in ((1, False), (1, True), (0, False), (0, True)):
            lab = _sweep_min(lab, mask, axis, rev, big)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        l, _, it = state
        l2 = _propagate_min(l, mask, big, inner)
        return l2, jnp.any(l2 != l), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.array(True), jnp.int32(0)))
    return lab


def label_components(mask: jnp.ndarray, max_iters: int = 64, inner: int = 16) -> jnp.ndarray:
    """4-connected component labels, compacted to 1..n in raster order of the
    first pixel (scipy.ndimage.label convention). Uses one full-size gather —
    prefer ``label_components_raw`` + ``component_boxes_from_raw`` on the hot
    path."""
    h, w = mask.shape
    mask = mask.astype(bool)
    n = h * w
    lab = label_components_raw(mask, max_iters=max_iters, inner=inner)
    flat = lab.reshape(-1)
    is_root = (flat == jnp.arange(n, dtype=jnp.int32)) & mask.reshape(-1)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    rank_ext = jnp.concatenate([rank, jnp.array([0], jnp.int32)])
    out = jnp.where(mask.reshape(-1), rank_ext[flat], 0)
    return out.reshape(h, w)


def first_roots(
    lab: jnp.ndarray,
    mask: jnp.ndarray,
    max_components: int,
    row_cap: int | None = 96,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First ``max_components`` component roots (min-linear-index pixels) in
    raster order. Returns (roots (K,) int32 — padding = H·W, valid (K,)).

    Two-stage exact top-k: per-ROW top-``row_cap`` (sorting H rows of W beats
    one H·W sort ~7× on the VPU), then a global top-k over H·row_cap
    survivors. Exact as long as no single row holds > row_cap roots: a root
    is its component's first pixel and components on the main path come out
    of a 5×5 binary opening, so their row pitch is ≥ 6 px ⇒ ≤ ceil(W/6)
    roots/row (86 at W=512). ``row_cap=None`` forces the single-sort path."""
    h, w = lab.shape
    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    is_root = (lab == idx) & mask.astype(bool)
    scores = jnp.where(is_root, -idx, -jnp.int32(n))
    if row_cap is not None and row_cap < w and h > 1:
        row_top, _ = jax.lax.top_k(scores, min(row_cap, w))  # (H, row_cap)
        scores = row_top.reshape(-1)
    else:
        scores = scores.reshape(-1)
    top, _ = jax.lax.top_k(scores, max_components)
    roots = -top  # ascending linear indices; padding slots = n
    return roots, roots < n


@partial(jax.jit, static_argnames=("max_components", "row_cap"))
def component_boxes_from_raw(
    lab: jnp.ndarray,  # raw labels (min linear index per component)
    mask: jnp.ndarray,
    max_components: int = 512,
    row_cap: int | None = 96,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Boxes/areas for the first ``max_components`` components in raster
    order, without gathers: two-stage top-k root extraction + row-factored
    masked reductions (reduce W first — per-element work on the (K, H, W)
    compare drops ~40% vs five direct (K, H, W) reductions; y stats and area
    finish on the small (K, H) row aggregates).

    Returns (boxes (K, 4) [x1, y1, x2+1, y2+1] float32, areas (K,) int32,
    valid (K,))."""
    roots, valid = first_roots(lab, mask, max_components, row_cap)
    boxes, areas = boxes_from_roots(lab, roots)
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    areas = jnp.where(valid, areas, 0)
    return boxes, areas, valid


def boxes_from_roots(lab: jnp.ndarray, roots: jnp.ndarray):
    """Row-factored box/area extraction for given component ids.
    lab (H, W) raw labels, roots (K,) label values (padding = out-of-range).
    Returns (boxes (K, 4) [x1, y1, x2+1, y2+1] f32, areas (K,) int32).

    On TPU with Mosaic-friendly shapes this dispatches to the single-pass
    Pallas kernel (ops/components_pallas.py — label rows stay in VMEM, all
    five stats accumulate in one sweep); the XLA row-factored path is the
    fallback and the oracle."""
    h, w = lab.shape
    k = roots.shape[0]
    if (
        os.environ.get("NUHTC_COMPONENTS_KERNEL", "xla") == "pallas"
        and jax.default_backend() != "cpu"
        and k % 128 == 0 and h % 8 == 0 and w % 128 == 0
    ):
        # OPT-IN, not default: exact match vs the XLA path on a real TPU v5e
        # (05c0bd1), but SLOWER in-model — end-to-end bench at B16 drops
        # 93.8 -> 81.3 tiles/s (~26 ms/step): under vmap the per-image
        # pallas_call serializes while the XLA row-factored path fuses
        # across the batch (round-4 A/B, BASELINE.md)
        from nuhtc_tpu.ops.components_pallas import boxes_from_roots_pallas

        return boxes_from_roots_pallas(lab, roots)
    eq = lab[None, :, :] == roots[:, None, None]  # (K, H, W), fused below
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inf = jnp.float32(1e9)
    row_xmin = jnp.min(jnp.where(eq, xs, inf), axis=2)  # (K, H)
    row_xmax = jnp.max(jnp.where(eq, xs, -inf), axis=2)
    row_cnt = jnp.sum(eq, axis=2, dtype=jnp.int32)

    ys = jnp.arange(h, dtype=jnp.float32)[None, :]
    row_any = row_cnt > 0
    x_min = jnp.min(row_xmin, axis=1)
    x_max = jnp.max(row_xmax, axis=1)
    y_min = jnp.min(jnp.where(row_any, ys, inf), axis=1)
    y_max = jnp.max(jnp.where(row_any, ys, -inf), axis=1)
    areas = jnp.sum(row_cnt, axis=1)

    boxes = jnp.stack([x_min, y_min, x_max + 1.0, y_max + 1.0], axis=-1)
    return boxes.astype(jnp.float32), areas


@partial(jax.jit, static_argnames=("max_components",))
def component_boxes(
    labels: jnp.ndarray, max_components: int = 512
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-component bbox + area from a compact label map (components 1..K)."""
    h, w = labels.shape
    k = max_components
    ids = jnp.arange(1, k + 1, dtype=labels.dtype)
    eq = labels[None, :, :] == ids[:, None, None]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inf = jnp.float32(1e9)
    x_min = jnp.min(jnp.where(eq, xs, inf), axis=(1, 2))
    x_max = jnp.max(jnp.where(eq, xs, -inf), axis=(1, 2))
    y_min = jnp.min(jnp.where(eq, ys, inf), axis=(1, 2))
    y_max = jnp.max(jnp.where(eq, ys, -inf), axis=(1, 2))
    areas = jnp.sum(eq, axis=(1, 2)).astype(jnp.int32)
    valid = areas > 0
    boxes = jnp.stack([x_min, y_min, x_max + 1.0, y_max + 1.0], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    return boxes.astype(jnp.float32), areas, valid


def component_proposals(
    semantic_logits: jnp.ndarray,  # (Hs, Ws) float — semantic head logits
    img_shape: tuple[int, int],
    max_components: int = 512,
    min_area: int = 10,
    thres: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The device-side equivalent of the reference ``_watershed_proposal``
    (inference path, no seg head): upsample logits → blur → threshold →
    open(5×5, 2) → fill holes → connected components → area-filtered boxes.

    Returns (boxes (K, 5) [x1,y1,x2,y2,score=1], valid (K,)).
    """
    from nuhtc_tpu.ops import morphology

    h, w = img_shape
    # reference: F.interpolate(align_corners=True) then gaussian_blur(5). Both
    # are separable linear operators, so blur∘resize composes into ONE pair of
    # per-axis matrices applied to the low-res map — the 512² intermediate
    # (resize 8.6 ms + blur 6.2 ms at B16 on v5e) collapses to ~1 ms of
    # matmuls. Exact up to f32 reassociation.
    blurred = resize_blur_align_corners(semantic_logits, (h, w))
    mask = blurred > thres
    mask = morphology.binary_open(mask, ksize=5, iterations=2) > 0.5
    mask = morphology.fill_holes(mask)
    lab = label_components_raw(mask)
    boxes, areas, valid = component_boxes_from_raw(lab, mask, max_components)
    max_area = h * w / 4
    valid = valid & (areas > min_area) & (areas < max_area)
    boxes5 = jnp.concatenate([boxes, jnp.ones((boxes.shape[0], 1), boxes.dtype)], axis=-1)
    boxes5 = jnp.where(valid[:, None], boxes5, 0.0)
    return boxes5, valid


def component_proposals_batched(
    semantic_logits: jnp.ndarray,  # (B, Hs, Ws) float — semantic head logits
    img_shape: tuple[int, int],
    max_components: int = 512,
    min_area: int = 10,
    thres: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ``component_proposals``: mask prep + CCL + root extraction run
    under vmap (shift/scan ops batch cleanly), while the box/area reduction
    goes through ONE batch-grid Pallas call when enabled
    (NUHTC_COMPONENTS_KERNEL=pallas) — the per-image kernel under vmap
    serialized B pallas_calls and lost in-model (BASELINE.md round 4);
    the batched grid keeps the single-pass VMEM economics without that."""
    from nuhtc_tpu.ops import morphology

    h, w = img_shape
    b = semantic_logits.shape[0]
    k = max_components

    def prep(sl):
        blurred = resize_blur_align_corners(sl, (h, w))
        mask = blurred > thres
        mask = morphology.binary_open(mask, ksize=5, iterations=2) > 0.5
        mask = morphology.fill_holes(mask)
        lab = label_components_raw(mask)
        roots, valid = first_roots(lab, mask, k, 96)
        return lab, roots, valid

    lab, roots, valid = jax.vmap(prep)(semantic_logits)

    if (
        os.environ.get("NUHTC_COMPONENTS_KERNEL", "xla") == "pallas"
        and jax.default_backend() != "cpu"
        and k % 128 == 0 and h % 8 == 0 and w % 128 == 0
    ):
        from nuhtc_tpu.ops.components_pallas import boxes_from_roots_pallas_batched

        boxes, areas = boxes_from_roots_pallas_batched(lab, roots)
    else:
        boxes, areas = jax.vmap(lambda l, r: boxes_from_roots(l, r))(lab, roots)

    boxes = jnp.where(valid[..., None], boxes, 0.0)
    areas = jnp.where(valid, areas, 0)
    max_area = h * w / 4
    valid = valid & (areas > min_area) & (areas < max_area)
    boxes5 = jnp.concatenate([boxes, jnp.ones((b, k, 1), boxes.dtype)], axis=-1)
    boxes5 = jnp.where(valid[..., None], boxes5, 0.0)
    return boxes5, valid


def _axis_resize_np(src: int, dst: int) -> np.ndarray:
    if dst == 1:
        return np.ones((1, src))
    coords = np.arange(dst) * (src - 1) / (dst - 1)
    low = np.clip(np.floor(coords), 0, src - 1).astype(int)
    high = np.clip(low + 1, 0, src - 1)
    frac = coords - low
    m = np.zeros((dst, src))
    np.add.at(m, (np.arange(dst), low), 1 - frac)
    np.add.at(m, (np.arange(dst), high), frac)
    return m


def _axis_blur_np(n: int, kernel_size: int = 5, sigma: float | None = None) -> np.ndarray:
    from nuhtc_tpu.ops.morphology import gaussian_kernel1d

    kv = gaussian_kernel1d(kernel_size, sigma).astype(np.float64)
    pad = kernel_size // 2
    g = np.zeros((n, n))
    for t in range(kernel_size):
        for i in range(n):
            j = i - pad + t
            if j < 0:
                j = -j  # jnp.pad mode="reflect" (no edge repeat)
            if j >= n:
                j = 2 * (n - 1) - j
            g[i, j] += kv[t]
    return g


@lru_cache(maxsize=16)
def _resize_blur_mats(src_h, src_w, dst_h, dst_w, kernel_size, sigma):
    by = (_axis_blur_np(dst_h, kernel_size, sigma) @ _axis_resize_np(src_h, dst_h)).astype(
        np.float32
    )
    bx = (_axis_blur_np(dst_w, kernel_size, sigma) @ _axis_resize_np(src_w, dst_w)).astype(
        np.float32
    )
    return by, bx


def resize_blur_align_corners(
    img: jnp.ndarray, size: tuple[int, int], kernel_size: int = 5, sigma: float | None = None
) -> jnp.ndarray:
    """Fused ``gaussian_blur5(resize_align_corners(img, size))`` — the two
    separable linear operators composed into one (dst, src) matrix per axis."""
    h, w = img.shape[-2:]
    h2, w2 = size
    by, bx = _resize_blur_mats(h, w, h2, w2, kernel_size, sigma)
    lead = img.shape[:-2]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    out = jnp.einsum(
        "ih,bhw,jw->bij", jnp.asarray(by), x, jnp.asarray(bx),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (h2, w2)).astype(img.dtype)


@lru_cache(maxsize=16)
def _half_pixel_mats(src_h, src_w, dst_h, dst_w):
    def axis(src, dst):
        coords = (np.arange(dst) + 0.5) * src / dst - 0.5  # half-pixel centers
        low = np.clip(np.floor(coords), 0, src - 1).astype(int)
        high = np.clip(low + 1, 0, src - 1)
        frac = np.clip(coords - np.floor(coords), 0.0, 1.0)
        frac = np.where(coords < 0, 0.0, frac)  # border replicate
        m = np.zeros((dst, src))
        np.add.at(m, (np.arange(dst), low), 1 - frac)
        np.add.at(m, (np.arange(dst), high), frac)
        return m.astype(np.float32)

    return axis(src_h, dst_h), axis(src_w, dst_w)


def resize_half_pixel(img: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (cv2.INTER_LINEAR /
    align_corners=False semantics, border replicate). img: (..., H, W)."""
    h, w = img.shape[-2:]
    h2, w2 = size
    if (h, w) == (h2, w2):
        return img
    my, mx = _half_pixel_mats(h, w, h2, w2)
    lead = img.shape[:-2]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    out = jnp.einsum(
        "ih,bhw,jw->bij", jnp.asarray(my), x, jnp.asarray(mx),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (h2, w2)).astype(img.dtype)


def resize_align_corners(img: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with PyTorch ``align_corners=True`` semantics.

    img: (..., H, W) → (..., h2, w2). Source coordinate for output i is
    i * (H-1) / (h2-1).
    """
    h, w = img.shape[-2:]
    h2, w2 = size
    if (h, w) == (h2, w2):
        return img

    def axis_matrix(src: int, dst: int, dtype) -> jnp.ndarray:
        if dst == 1:
            return jnp.ones((1, src), dtype=dtype)
        coords = jnp.arange(dst, dtype=jnp.float32) * (src - 1) / (dst - 1)
        low = jnp.clip(jnp.floor(coords), 0, src - 1).astype(jnp.int32)
        high = jnp.clip(low + 1, 0, src - 1)
        frac = coords - low
        m = (
            jax.nn.one_hot(low, src, dtype=jnp.float32) * (1 - frac)[:, None]
            + jax.nn.one_hot(high, src, dtype=jnp.float32) * frac[:, None]
        )
        return m.astype(dtype)

    my = axis_matrix(h, h2, jnp.float32)  # (h2, H)
    mx = axis_matrix(w, w2, jnp.float32)  # (w2, W)
    lead = img.shape[:-2]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    out = jnp.einsum("ih,bhw,jw->bij", my, x, mx, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (h2, w2)).astype(img.dtype)
