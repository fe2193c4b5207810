"""Device-side EDT + watershed (the reference's seg-head proposal path).

The reference computes scipy ``distance_transform_edt`` + skimage
``watershed`` on host CPU mid-forward (nuhtc/models/htc_roi_head_cus.py:
300-320, active when a seg head provides a distance map). TPU-native
equivalents:

- ``edt``: jump-flooding (JFA) nearest-background-seed propagation — log2(N)
  passes of 8 fixed-offset shifts (pads, not gathers), giving the exact
  euclidean distance for all but rare JFA corner cases;
- ``watershed``: hill-climbing label assignment — each in-mask pixel points
  to its steepest-ascent neighbor on the (negated-elevation) surface, roots
  carry marker labels, and pointer chases collapse with log-many jump
  passes. Matches priority-flood watershed on clean unimodal basins (the
  EDT-of-nuclei case); saddle ties may differ by a pixel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift2(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift x by (dy, dx) filling vacated cells (static offsets → pads)."""
    h, w = x.shape[-2:]
    x = jnp.roll(x, (dy, dx), axis=(-2, -1))
    if dy > 0:
        x = x.at[..., :dy, :].set(fill)
    elif dy < 0:
        x = x.at[..., dy:, :].set(fill)
    if dx > 0:
        x = x.at[..., :, :dx].set(fill)
    elif dx < 0:
        x = x.at[..., :, dx:].set(fill)
    return x


@partial(jax.jit, static_argnames=())
def edt(mask: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance transform: distance of each fg pixel to the nearest
    bg pixel (scipy.ndimage.distance_transform_edt semantics). mask: (H, W)."""
    h, w = mask.shape
    mask = mask.astype(bool)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 20)
    # seed coords: bg pixels are their own seed; fg starts unseeded
    sy = jnp.where(~mask, yy, big)
    sx = jnp.where(~mask, xx, big)

    def dist2(syv, sxv):
        # coords < 2^13 → squared distance < 2^27, safe in int32 (x64 is off)
        dy = jnp.clip(syv, 0, h) - yy
        dx = jnp.clip(sxv, 0, w) - xx
        return jnp.where(syv >= big, jnp.int32(1 << 29), dy * dy + dx * dx)

    step = 1
    steps = []
    while step < max(h, w):
        step *= 2
    while step >= 1:
        steps.append(step)
        step //= 2
    # JFA+1: extra refinement pass at offset 1
    steps.append(1)

    for k in steps:
        best = dist2(sy, sx)
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cy = _shift2(sy, dy, dx, big)
                cx = _shift2(sx, dy, dx, big)
                d = dist2(cy, cx)
                take = d < best
                sy = jnp.where(take, cy, sy)
                sx = jnp.where(take, cx, sx)
                best = jnp.where(take, d, best)

    d = jnp.sqrt(dist2(sy, sx).astype(jnp.float32))
    return jnp.where(mask, d, 0.0)


def watershed(
    neg_elevation: jnp.ndarray,  # e.g. -distance (flood ascends -neg_elevation)
    markers: jnp.ndarray,  # (H, W) int labels, 0 = unlabeled
    mask: jnp.ndarray,
    jump_passes: int = 10,
) -> jnp.ndarray:
    """Marker-based watershed by steepest ascent to a marked basin root."""
    h, w = neg_elevation.shape
    mask = mask.astype(bool)
    elev = jnp.where(mask, -neg_elevation.astype(jnp.float32), -jnp.inf)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    self_idx = yy * w + xx

    # steepest 8-neighbor ascent pointer (self if local max or marked)
    best_val = elev
    parent = self_idx
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nv = _shift2(elev, dy, dx, -jnp.inf)
            ni = _shift2(self_idx, dy, dx, -1)
            take = nv > best_val
            best_val = jnp.where(take, nv, best_val)
            parent = jnp.where(take, ni, parent)
    parent = jnp.where(mask & (markers == 0), parent, self_idx)
    parent = jnp.where(parent < 0, self_idx, parent)

    # pointer chase: parent = parent[parent], log passes (gathers — this path
    # is off the main config; acceptable)
    flat_parent = parent.reshape(-1)
    for _ in range(jump_passes):
        flat_parent = flat_parent[flat_parent]
    labels = markers.reshape(-1)[flat_parent].reshape(h, w)
    return jnp.where(mask, labels, 0)


def watershed_segmentation(
    seg_logits: jnp.ndarray,  # (H, W, C) per-class seg-branch logits, ori frame
    dist: jnp.ndarray | None = None,  # optional (H, W) distance map
    max_instances: int = 256,
    min_area: int = 10,
    thres: float = 0.0,
    score: float = 0.36,
):
    """Per-class watershed instance extraction — the ``_Lite_Fuse`` fallback
    (reference nuhtc/models/htc_roi_head_cus.py:3524-3563
    ``_watershed_segmentation``).

    Reference recipe per class: gaussian_blur(5) → threshold > ``thres`` →
    binary_open(5×5, 2 iters) → fill_holes → EDT → markers = label(EDT>0.25)
    → watershed(-EDT, markers, mask) → instances filtered to
    ``min_area < area < H*W/4``, boxes scored at a fixed 0.36.

    Key simplification: with no distance branch (``semantic_dist=None`` in the
    reference), EDT ≥ 1 on every foreground pixel, so ``EDT > 0.25`` IS the
    mask and ``label`` marks whole components — the watershed degenerates to
    per-class connected components. We run shift-based CCL directly (exact
    equivalence, no gathers). With ``dist`` provided, markers come from
    ``dist > 0.25`` and instances from hill-climb watershed.

    Returns:
      boxes5 (C, K, 5) [x1, y1, x2+1, y2+1, score] float32,
      valid  (C, K) bool,
      inst   (C, H, W) int32 instance maps (id = component root linear index
             + 1; 0 = background). Mask of instance k of class c is
             ``inst[c] == roots[c, k] + 1``.
      roots  (C, K) int32 root linear indices (H*W on padding slots).
    """
    from nuhtc_tpu.ops import morphology
    from nuhtc_tpu.ops.components import boxes_from_roots, first_roots, label_components_raw

    h, w, c = seg_logits.shape
    n = h * w
    max_area = n / 4

    def one_class(logits_c):
        mask = morphology.gaussian_blur5(logits_c) > thres
        mask = morphology.binary_open(mask, ksize=5, iterations=2) > 0.5
        mask = morphology.fill_holes(mask)
        if dist is None:
            raw = label_components_raw(mask)
            inst = jnp.where(mask, raw + 1, 0)
            row_cap = 96  # exact: mask is 5x5-opened, root row pitch >= 6 px
        else:
            marker_mask = (dist > 0.25) & mask
            raw = label_components_raw(marker_mask)
            markers = jnp.where(marker_mask, raw + 1, 0)
            inst = watershed(-dist, markers, mask)
            raw = jnp.where(inst > 0, inst - 1, n)
            mask = inst > 0
            row_cap = None  # markers are UNopened; per-row root bound fails

        roots, valid = first_roots(raw, mask, max_instances, row_cap=row_cap)
        boxes, areas = boxes_from_roots(raw, roots)
        valid = valid & (areas > min_area) & (areas < max_area)
        boxes5 = jnp.concatenate(
            [boxes, jnp.full((boxes.shape[0], 1), score, boxes.dtype)], axis=-1
        )
        boxes5 = jnp.where(valid[:, None], boxes5, 0.0)
        return boxes5, valid, inst, jnp.where(valid, roots, n)

    return jax.vmap(one_class, in_axes=-1)(seg_logits)


def watershed_proposals_from_dist(
    seg_logits: jnp.ndarray,  # (H, W) binary-seg logits (seg head)
    dist_logits: jnp.ndarray,  # (H, W) distance-map logits (seg head)
    max_components: int = 512,
    min_area: int = 10,
    dist_thr: float = 0.25,
):
    """The seg-head variant of the reference ``_watershed_proposal``
    (htc_roi_head_cus.py:295-320 with semantic_dist): gaussian-blur the
    distance logits → sigmoid → markers from dist > 0.25 → watershed over
    -distance within the blurred/opened seg mask → component boxes."""
    from nuhtc_tpu.ops import morphology
    from nuhtc_tpu.ops.components import boxes_from_roots, first_roots, label_components_raw

    h, w = seg_logits.shape
    seg = morphology.gaussian_blur5(seg_logits)
    mask = seg > 0
    mask = morphology.binary_open(mask, ksize=5, iterations=2) > 0.5
    mask = morphology.fill_holes(mask)

    dist = jax.nn.sigmoid(morphology.gaussian_blur5(dist_logits))
    marker_mask = (dist > dist_thr) & mask
    raw = label_components_raw(marker_mask)
    markers = jnp.where(marker_mask, raw + 1, 0)  # distinct positive ids

    inst = watershed(-dist, markers, mask)

    # box extraction: watershed labels are (marker-root linear index + 1);
    # marker roots come from the raw marker label map. row_cap=None: markers
    # are raw dist>thr pixels (no morphological opening), so the per-row root
    # bound that makes the two-stage top-k exact does not hold here
    roots, valid = first_roots(raw, marker_mask, max_components, row_cap=None)
    boxes, areas = boxes_from_roots(inst, jnp.where(valid, roots + 1, -1))

    max_area = h * w / 4
    valid = valid & (areas > min_area) & (areas < max_area)
    boxes5 = jnp.concatenate([boxes, jnp.ones((boxes.shape[0], 1), boxes.dtype)], axis=-1)
    return jnp.where(valid[:, None], boxes5, 0.0), valid
