"""Per-nucleus morphometric / intensity / texture features (host-side).

Replaces the reference's histomicstk.compute_nuclei_features dependency
(reference tools/wsi_feat_extract.py:93-107, ~90 feature columns,
README.md:281-287) with a self-contained implementation:

- shape: area, perimeter, circularity, eccentricity, solidity, extent,
  equivalent diameter, major/minor axis length, orientation, bbox;
- intensity (per requested channel, default hematoxylin via Ruifrok-Johnston
  color deconvolution + RGB): mean/std/min/max/median/MAD/entropy;
- texture: GLCM Haralick stats (contrast, dissimilarity, homogeneity, ASM,
  energy, correlation, entropy) averaged over 4 offsets.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import cv2
import numpy as np

# Ruifrok & Johnston H&E stain vectors (rows: H, E, residual)
_STAIN_MATRIX = np.array(
    [
        [0.650, 0.704, 0.286],
        [0.072, 0.990, 0.105],
        [0.268, 0.570, 0.776],
    ]
)
_STAIN_MATRIX = _STAIN_MATRIX / np.linalg.norm(_STAIN_MATRIX, axis=1, keepdims=True)
_STAIN_INV = np.linalg.inv(_STAIN_MATRIX.T)


def color_deconvolution(rgb: np.ndarray) -> np.ndarray:
    """RGB uint8 → stain concentration maps (H, E, residual), float32 (H, W, 3)."""
    od = -np.log10((rgb.astype(np.float64) + 1.0) / 256.0)
    conc = od.reshape(-1, 3) @ _STAIN_INV.T
    return conc.reshape(rgb.shape).astype(np.float32)


def _glcm(gray: np.ndarray, mask: np.ndarray, levels: int = 16) -> Dict[str, float]:
    g = np.clip((gray / 256.0 * levels).astype(np.int32), 0, levels - 1)
    feats = {k: 0.0 for k in ("contrast", "dissimilarity", "homogeneity", "asm", "correlation", "entropy")}
    offsets = [(0, 1), (1, 0), (1, 1), (1, -1)]
    valid_offsets = 0
    for dy, dx in offsets:
        h, w = g.shape
        src = g[max(-dy, 0) : h - max(dy, 0), max(-dx, 0) : w - max(dx, 0)]
        dst = g[max(dy, 0) : h - max(-dy, 0), max(dx, 0) : w - max(-dx, 0)]
        msrc = mask[max(-dy, 0) : h - max(dy, 0), max(-dx, 0) : w - max(dx, 0)]
        mdst = mask[max(dy, 0) : h - max(-dy, 0), max(dx, 0) : w - max(-dx, 0)]
        sel = (msrc > 0) & (mdst > 0)
        if sel.sum() < 4:
            continue
        valid_offsets += 1
        pairs = src[sel] * levels + dst[sel]
        p = np.bincount(pairs, minlength=levels * levels).astype(np.float64)
        p /= p.sum()
        p2 = p.reshape(levels, levels)
        i_idx, j_idx = np.mgrid[:levels, :levels]
        diff = i_idx - j_idx
        feats["contrast"] += float((p2 * diff**2).sum())
        feats["dissimilarity"] += float((p2 * np.abs(diff)).sum())
        feats["homogeneity"] += float((p2 / (1.0 + diff**2)).sum())
        asm = float((p2**2).sum())
        feats["asm"] += asm
        mu_i = float((p2.sum(1) * np.arange(levels)).sum())
        mu_j = float((p2.sum(0) * np.arange(levels)).sum())
        sd_i = math.sqrt(max(float((p2.sum(1) * (np.arange(levels) - mu_i) ** 2).sum()), 1e-12))
        sd_j = math.sqrt(max(float((p2.sum(0) * (np.arange(levels) - mu_j) ** 2).sum()), 1e-12))
        feats["correlation"] += float(
            ((p2 * (i_idx - mu_i) * (j_idx - mu_j)).sum()) / (sd_i * sd_j)
        )
        nz = p2[p2 > 0]
        feats["entropy"] += float(-(nz * np.log2(nz)).sum())
    if valid_offsets:
        for k in feats:
            feats[k] /= valid_offsets
    feats["energy"] = math.sqrt(max(feats.pop("asm"), 0.0))
    return feats


def _intensity_stats(ch: np.ndarray, mask: np.ndarray, prefix: str) -> Dict[str, float]:
    vals = ch[mask > 0].astype(np.float64)
    if len(vals) == 0:
        return {f"{prefix}_{k}": 0.0 for k in ("mean", "std", "min", "max", "median", "mad", "entropy")}
    hist, _ = np.histogram(vals, bins=32)
    p = hist / max(hist.sum(), 1)
    nz = p[p > 0]
    return {
        f"{prefix}_mean": float(vals.mean()),
        f"{prefix}_std": float(vals.std()),
        f"{prefix}_min": float(vals.min()),
        f"{prefix}_max": float(vals.max()),
        f"{prefix}_median": float(np.median(vals)),
        f"{prefix}_mad": float(np.median(np.abs(vals - np.median(vals)))),
        f"{prefix}_entropy": float(-(nz * np.log2(nz)).sum()),
    }


def nucleus_features(
    rgb: np.ndarray,  # crop around the nucleus, RGB uint8
    mask: np.ndarray,  # same-size binary mask
    offset=(0, 0),  # crop origin in slide coords
    with_texture: bool = True,
    with_intensity: bool = True,
) -> Optional[Dict[str, float]]:
    mask = (mask > 0).astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    cont = max(contours, key=cv2.contourArea)
    area = float(cv2.contourArea(cont))
    if area <= 0:
        return None
    perimeter = float(cv2.arcLength(cont, True))
    m = cv2.moments(cont)
    cx = m["m10"] / max(m["m00"], 1e-9) + offset[0]
    cy = m["m01"] / max(m["m00"], 1e-9) + offset[1]
    hull = cv2.convexHull(cont)
    hull_area = max(float(cv2.contourArea(hull)), 1e-9)
    x, y, bw, bh = cv2.boundingRect(cont)

    # ellipse fit (needs ≥5 points)
    if len(cont) >= 5:
        (_, _), (ma, mi), angle = cv2.fitEllipse(cont)
        major, minor = max(ma, mi), min(ma, mi)
    else:
        major = max(bw, bh)
        minor = min(bw, bh)
        angle = 0.0
    ecc = math.sqrt(max(1 - (minor / max(major, 1e-9)) ** 2, 0.0))

    feats = {
        "centroid_x": cx,
        "centroid_y": cy,
        "area": area,
        "perimeter": perimeter,
        "circularity": 4 * math.pi * area / max(perimeter**2, 1e-9),
        "eccentricity": ecc,
        "major_axis_length": major,
        "minor_axis_length": minor,
        "orientation": angle,
        "solidity": area / hull_area,
        "extent": area / max(bw * bh, 1e-9),
        "equivalent_diameter": math.sqrt(4 * area / math.pi),
        "bbox_x": x + offset[0],
        "bbox_y": y + offset[1],
        "bbox_w": bw,
        "bbox_h": bh,
    }
    if with_intensity:
        conc = color_deconvolution(rgb)
        feats.update(_intensity_stats(conc[..., 0], mask, "hematoxylin"))
        feats.update(_intensity_stats(conc[..., 1], mask, "eosin"))
        for i, name in enumerate(("r", "g", "b")):
            feats.update(_intensity_stats(rgb[..., i].astype(np.float64), mask, name))
    if with_texture:
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        for k, v in _glcm(gray, mask).items():
            feats[f"haralick_{k}"] = v
    return feats
