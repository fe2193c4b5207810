"""Slide reading abstraction.

The reference reads WSIs through OpenSlide (reference tools/infer_wsi.py:5,
tools/wsi_core/WholeSlideImage.py:36). OpenSlide isn't available in every
environment, so we define a small reader interface with two backends:
- ``OpenSlideReader`` when the library is importable;
- ``ImageReader`` for plain raster images (PNG/JPG/BMP/TIF via cv2), treating
  the image as a single-level slide — enough for development, tests, and
  small tiles-as-slides workflows.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

try:
    import openslide  # type: ignore

    HAS_OPENSLIDE = True
except ImportError:
    openslide = None
    HAS_OPENSLIDE = False


class SlideReader:
    """Interface: level_dimensions, level_downsamples, read_region, properties."""

    path: str
    level_dimensions: List[Tuple[int, int]]  # (w, h) per level
    level_downsamples: List[float]
    properties: dict

    @property
    def dimensions(self) -> Tuple[int, int]:
        return self.level_dimensions[0]

    def read_region(self, location: Tuple[int, int], level: int, size: Tuple[int, int]) -> np.ndarray:
        """(x, y) level-0 coords → RGB uint8 (size[1], size[0], 3)."""
        raise NotImplementedError

    def get_best_level_for_downsample(self, downsample: float) -> int:
        best = 0
        for i, ds in enumerate(self.level_downsamples):
            if ds <= downsample + 0.01:
                best = i
        return best

    @property
    def magnification(self) -> Optional[float]:
        for key in ("openslide.objective-power", "aperio.AppMag"):
            if key in self.properties:
                try:
                    return float(self.properties[key])
                except ValueError:
                    pass
        return None


class OpenSlideReader(SlideReader):
    def __init__(self, path: str):
        self.path = path
        self._osr = openslide.open_slide(path)
        self.level_dimensions = list(self._osr.level_dimensions)
        self.level_downsamples = list(self._osr.level_downsamples)
        self.properties = dict(self._osr.properties)

    def read_region(self, location, level, size):
        img = self._osr.read_region(location, level, size).convert("RGB")
        return np.asarray(img)


class ImageReader(SlideReader):
    """Plain image as a one-level slide (dev/test backend)."""

    def __init__(self, path: str):
        import cv2

        self.path = path
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        self._img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = self._img.shape[:2]
        self.level_dimensions = [(w, h)]
        self.level_downsamples = [1.0]
        self.properties = {}

    def read_region(self, location, level, size):
        x, y = location
        w, h = size
        out = np.zeros((h, w, 3), np.uint8)
        ih, iw = self._img.shape[:2]
        x2, y2 = min(x + w, iw), min(y + h, ih)
        x1, y1 = max(x, 0), max(y, 0)
        if x2 > x1 and y2 > y1:
            out[y1 - y : y2 - y, x1 - x : x2 - x] = self._img[y1:y2, x1:x2]
        return out


def open_slide(path: str) -> SlideReader:
    ext = os.path.splitext(path)[1].lower()
    if HAS_OPENSLIDE and ext in (".svs", ".ndpi", ".mrxs", ".scn", ".svslide", ".tiff", ".tif", ".bif", ".vms", ".vmu"):
        return OpenSlideReader(path)
    if HAS_OPENSLIDE:
        try:
            return OpenSlideReader(path)
        except Exception:
            pass
    return ImageReader(path)
