"""Reinhard stain normalization for H&E tiles.

The reference CLI exposes ``--stain_norm`` on tools/extract_features_nuhtc.py
(:195-197) but its vendored ``Whole_Slide_Bag_FP`` never accepts the kwarg
(tools/wsi_core/WholeSlideImage.py:832-841) — the flag TypeErrors upstream.
We implement the standard behavior the flag advertises: map each tile's LAB
statistics onto a fixed H&E target (Reinhard et al. 2001), the common
normalizer in WSI feature pipelines. Pure numpy/cv2 host-side — runs in the
loader threads, off the device path.
"""

from __future__ import annotations

import numpy as np

# LAB (OpenCV 8-bit scaling) mean/std of a canonical well-stained H&E tile.
TARGET_MEANS = np.array([148.60, 169.30, 105.97], np.float32)
TARGET_STDS = np.array([41.56, 9.01, 6.67], np.float32)


def reinhard_normalize(rgb: np.ndarray,
                       target_means: np.ndarray = TARGET_MEANS,
                       target_stds: np.ndarray = TARGET_STDS) -> np.ndarray:
    """Normalize an (H, W, 3) uint8 RGB tile's LAB statistics to the target."""
    import cv2

    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB).astype(np.float32)
    mean = lab.reshape(-1, 3).mean(0)
    std = lab.reshape(-1, 3).std(0)
    std = np.where(std < 1e-6, 1.0, std)
    lab = (lab - mean) / std * target_stds + target_means
    lab = np.clip(lab, 0, 255).astype(np.uint8)
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
