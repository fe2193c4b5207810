"""Score-heatmap rendering + legacy patch generation over a slide.

Behavioral port of the reference ``WholeSlideImage.visHeatmap`` /
``block_blending`` / ``get_seg_mask`` (tools/wsi_core/WholeSlideImage.py:
504-756) and the legacy patch generator ``_getPatchGenerator`` (:285-352),
plus the small score utilities from tools/wsi_core/wsi_utils.py:136-147
(``to_percentiles``, ``screen_coords``) and :11-24 (white/black patch
filters). Pure host code (numpy/cv2 + the SlideReader abstraction) — the
heatmap is a visualization artifact, not a device workload.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import cv2
import numpy as np

from nuhtc_tpu.wsi.slide import SlideReader
from nuhtc_tpu.wsi.tissue import TissueSegmentation, _four_pt_check, _in_holes


def to_percentiles(scores: np.ndarray) -> np.ndarray:
    """Rank-average percentile scores in [0, 100] (wsi_utils.py:136)."""
    from scipy.stats import rankdata

    return rankdata(scores, "average") / len(scores) * 100


def screen_coords(scores, coords, top_left, bot_right):
    """Keep (score, coord) pairs inside the bbox (wsi_utils.py:141)."""
    top_left = np.asarray(top_left)
    bot_right = np.asarray(bot_right)
    mask = np.logical_and(
        np.all(coords >= top_left, axis=1), np.all(coords <= bot_right, axis=1)
    )
    return scores[mask], coords[mask]


def is_white_patch(patch: np.ndarray, sat_thresh: int = 5) -> bool:
    """wsi_utils.py:11 — low-saturation patch."""
    patch_hsv = cv2.cvtColor(patch, cv2.COLOR_RGB2HSV)
    return bool((patch_hsv[:, :, 1] < sat_thresh).all())


def is_black_patch(patch: np.ndarray, rgb_thresh: int = 40) -> bool:
    """wsi_utils.py:18 — uniformly dark patch."""
    return bool((patch < rgb_thresh).all())


def get_seg_mask(
    seg: TissueSegmentation,
    region_size: Tuple[int, int],  # (w, h) at the vis level
    scale: float,
    use_holes: bool = False,
    offset: Tuple[int, int] = (0, 0),  # level-0 top-left of the region
) -> np.ndarray:
    """Rasterize tissue contours into a bool mask at the vis level
    (reference get_seg_mask, WholeSlideImage.py:737-755): contours sorted
    by area descending, holes carved per contour when use_holes."""
    mask = np.zeros((region_size[1], region_size[0]), np.uint8)
    conts = [np.array(c * scale, np.int32) for c in seg.contours]
    holes = [[np.array(h * scale, np.int32) for h in hs] for hs in seg.holes]
    off = tuple((np.asarray(offset, np.float64) * scale * -1).astype(np.int32))
    order = sorted(
        range(len(conts)), key=lambda i: cv2.contourArea(conts[i]), reverse=True
    )
    for i in order:
        cv2.drawContours(mask, conts, i, color=1, offset=off, thickness=-1)
        if use_holes and holes[i]:
            cv2.drawContours(mask, holes[i], -1, color=0, offset=off, thickness=-1)
    return mask.astype(bool)


def _cmap(name: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt.get_cmap(name)


def block_blend(
    slide: SlideReader,
    img: np.ndarray,
    vis_level: int,
    top_left: Tuple[int, int],
    bot_right: Tuple[int, int],
    alpha: float = 0.5,
    blank_canvas: bool = False,
    block_size: int = 1024,
) -> np.ndarray:
    """Alpha-blend the rendered heatmap with the slide (or a white canvas)
    in bounded blocks (reference block_blending, WholeSlideImage.py:695-735
    — blockwise so giant regions never materialize a second full copy)."""
    downsample = int(slide.level_downsamples[vis_level])
    h, w = img.shape[:2]
    bx, by = min(block_size, w), min(block_size, h)
    for x_start in range(top_left[0], bot_right[0], bx * downsample):
        for y_start in range(top_left[1], bot_right[1], by * downsample):
            x_img = int((x_start - top_left[0]) / downsample)
            y_img = int((y_start - top_left[1]) / downsample)
            x_end, y_end = min(w, x_img + bx), min(h, y_img + by)
            if x_end == x_img or y_end == y_img:
                continue
            block = img[y_img:y_end, x_img:x_end]
            size = (x_end - x_img, y_end - y_img)
            if blank_canvas:
                canvas = np.full((size[1], size[0], 3), 255, np.uint8)
            else:
                canvas = np.ascontiguousarray(
                    slide.read_region((x_start, y_start), vis_level, size)
                )
            img[y_img:y_end, x_img:x_end] = cv2.addWeighted(
                block, alpha, canvas, 1 - alpha, 0
            )
    return img


def vis_heatmap(
    slide: SlideReader,
    scores: np.ndarray,
    coords: np.ndarray,
    seg: Optional[TissueSegmentation] = None,
    vis_level: int = -1,
    top_left=None,
    bot_right=None,
    patch_size: Tuple[int, int] = (256, 256),
    blank_canvas: bool = False,
    alpha: float = 0.4,
    blur: bool = False,
    overlap: float = 0.0,
    segment: bool = True,
    use_holes: bool = True,
    convert_to_percentiles: bool = False,
    binarize: bool = False,
    thresh: float = 0.5,
    max_size: Optional[int] = None,
    custom_downsample: int = 1,
    cmap: str = "coolwarm",
) -> np.ndarray:
    """Render per-patch attention/probability scores as a slide heatmap —
    reference ``WholeSlideImage.visHeatmap`` (WholeSlideImage.py:504-693):

    1. accumulate scores over overlapping patch footprints (mean per pixel),
    2. optional percentile normalization / binarization / gaussian blur,
    3. colormap the accumulated map, paint it over the slide (clipped to the
       tissue mask when ``segment``), and
    4. alpha-blend with the underlying slide blockwise.

    ``scores`` are raw in [0, 1] (or any range with
    convert_to_percentiles=True); ``coords`` are level-0 (x, y). Returns an
    RGB uint8 array at ``vis_level`` (optionally downscaled).
    """
    scores = np.asarray(scores, np.float64).reshape(-1).copy()
    coords = np.asarray(coords, np.int64).reshape(-1, 2)
    if vis_level < 0:
        vis_level = slide.get_best_level_for_downsample(32)
    scale = 1.0 / slide.level_downsamples[vis_level]

    threshold = (1.0 / len(scores) if thresh < 0 else thresh) if binarize else 0.0

    if top_left is not None and bot_right is not None:
        scores, coords = screen_coords(scores, coords, top_left, bot_right)
        coords = coords - np.asarray(top_left)
        top_left = tuple(top_left)
        bot_right = tuple(bot_right)
        w, h = tuple(
            (np.array(bot_right) * scale).astype(int)
            - (np.array(top_left) * scale).astype(int)
        )
        region_size = (w, h)
    else:
        region_size = slide.level_dimensions[vis_level]
        top_left = (0, 0)
        bot_right = slide.dimensions
        w, h = region_size

    ps = np.ceil(np.array(patch_size) * scale).astype(int)
    coords = np.ceil(coords * scale).astype(int)

    if convert_to_percentiles:
        scores = to_percentiles(scores)
    # unconditional /100 after the optional percentile pass
    # (WholeSlideImage.py:583) — raw scores are expected in [0, 100];
    # probability-style [0, 1] callers pass scores*100
    scores = scores / 100

    overlay = np.zeros((h, w), np.float64)
    counter = np.zeros((h, w), np.uint16)
    for idx in range(len(coords)):
        score = scores[idx]
        x, y = coords[idx]
        if score >= threshold:
            if binarize:
                score = 1.0
        else:
            score = 0.0
        overlay[y : y + ps[1], x : x + ps[0]] += score
        counter[y : y + ps[1], x : x + ps[0]] += 1

    nz = counter > 0
    overlay[nz] = overlay[nz] / counter[nz]
    if binarize:
        overlay[nz] = np.around(overlay[nz])
    del counter

    if blur:
        k = tuple((ps * (1 - overlap)).astype(int) * 2 + 1)
        overlay = cv2.GaussianBlur(overlay, k, 0)

    tissue_mask = None
    if segment and seg is not None:
        tissue_mask = get_seg_mask(
            seg, region_size, scale, use_holes=use_holes, offset=tuple(top_left)
        )

    if blank_canvas:
        img = np.full((h, w, 3), 255, np.uint8)
    else:
        img = np.ascontiguousarray(slide.read_region(top_left, vis_level, region_size))

    colormap = _cmap(cmap)
    for idx in range(len(coords)):
        if scores[idx] < threshold:
            continue
        x, y = coords[idx]
        raw_block = overlay[y : y + ps[1], x : x + ps[0]]
        color_block = (colormap(raw_block) * 255)[:, :, :3].astype(np.uint8)
        if tissue_mask is not None:
            img_block = img[y : y + ps[1], x : x + ps[0]].copy()
            mask_block = tissue_mask[y : y + ps[1], x : x + ps[0]]
            img_block[mask_block] = color_block[mask_block]
        else:
            img_block = color_block
        img[y : y + ps[1], x : x + ps[0]] = img_block

    del overlay
    if blur:
        k = tuple((ps * (1 - overlap)).astype(int) * 2 + 1)
        img = cv2.GaussianBlur(img, k, 0)

    if alpha < 1.0:
        img = block_blend(
            slide, img, vis_level, top_left, bot_right,
            alpha=alpha, blank_canvas=blank_canvas,
        )

    if custom_downsample > 1:
        img = cv2.resize(
            img, (int(w / custom_downsample), int(h / custom_downsample)),
            interpolation=cv2.INTER_LINEAR,
        )
    hh, ww = img.shape[:2]
    if max_size is not None and (ww > max_size or hh > max_size):
        f = max_size / ww if ww > hh else max_size / hh
        img = cv2.resize(
            img, (int(ww * f), int(hh * f)), interpolation=cv2.INTER_LINEAR
        )
    return img


def iter_patches(
    slide: SlideReader,
    seg: TissueSegmentation,
    patch_level: int = 0,
    patch_size: int = 256,
    step_size: int = 256,
    custom_downsample: int = 1,
    white_black: bool = True,
    white_thresh: int = 15,
    black_thresh: int = 50,
    use_padding: bool = True,
) -> Iterator[dict]:
    """Legacy contour-bounded patch generator (reference
    ``_getPatchGenerator``, WholeSlideImage.py:285-352): stride-grid each
    tissue contour's bounding rect, keep four-pt in-contour / out-of-hole
    positions, read the patch, drop white/black patches, and yield
    ``{'x', 'y', 'cont_idx', 'patch_level', 'patch', 'downsample'}`` with
    x/y in patch-level (downsampled) coordinates."""
    if custom_downsample > 1:
        assert custom_downsample == 2, "reference supports only 2x"
        target = patch_size
        patch_size, step_size = patch_size * 2, step_size * 2
    downsample = int(slide.level_downsamples[patch_level])
    ref_ps = patch_size * downsample
    step = step_size * downsample
    img_w, img_h = slide.dimensions
    for cont_idx, (cont, holes) in enumerate(zip(seg.contours, seg.holes)):
        x0, y0, cw, ch = cv2.boundingRect(cont)
        stop_y = y0 + ch if use_padding else min(y0 + ch, img_h - ref_ps)
        stop_x = x0 + cw if use_padding else min(x0 + cw, img_w - ref_ps)
        for y in range(y0, stop_y, step):
            for x in range(x0, stop_x, step):
                if not _four_pt_check(cont, (x, y), ref_ps) or _in_holes(
                    holes, (x, y), ref_ps
                ):
                    continue
                patch = slide.read_region((x, y), patch_level, (patch_size, patch_size))
                if custom_downsample > 1:
                    patch = cv2.resize(
                        patch, (target, target), interpolation=cv2.INTER_LINEAR
                    )
                if white_black and (
                    is_black_patch(patch, rgb_thresh=black_thresh)
                    or is_white_patch(patch, sat_thresh=white_thresh)
                ):
                    continue
                yield dict(
                    x=x // (downsample * custom_downsample),
                    y=y // (downsample * custom_downsample),
                    cont_idx=cont_idx,
                    patch_level=patch_level,
                    downsample=slide.level_downsamples[patch_level],
                    patch=patch,
                )
