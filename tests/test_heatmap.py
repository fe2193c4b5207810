"""vis_heatmap / legacy patch generator rendering tests on synthetic scores
(reference WholeSlideImage.visHeatmap, tools/wsi_core/WholeSlideImage.py:504)."""

import numpy as np
import pytest

from nuhtc_tpu.wsi.heatmap import (
    is_black_patch,
    is_white_patch,
    get_seg_mask,
    iter_patches,
    screen_coords,
    to_percentiles,
    vis_heatmap,
)
from nuhtc_tpu.wsi.tissue import TissueSegmentation


class ArraySlide:
    """In-memory SlideReader test double (single level)."""

    def __init__(self, img):
        self._img = img
        h, w = img.shape[:2]
        self.level_dimensions = [(w, h)]
        self.level_downsamples = [1.0]
        self.properties = {}

    @property
    def dimensions(self):
        return self.level_dimensions[0]

    def get_best_level_for_downsample(self, ds):
        return 0

    def read_region(self, location, level, size):
        x, y = location
        w, h = size
        out = np.zeros((h, w, 3), np.uint8)
        ih, iw = self._img.shape[:2]
        x2, y2 = min(x + w, iw), min(y + h, ih)
        if x2 > x and y2 > y:
            out[: y2 - y, : x2 - x] = self._img[y:y2, x:x2]
        return out


@pytest.fixture(scope="module")
def slide_and_seg():
    rng = np.random.RandomState(0)
    img = np.full((512, 512, 3), 230, np.uint8)
    img[64:448, 64:448] = rng.randint(120, 200, (384, 384, 3), np.uint8)
    slide = ArraySlide(img)
    cont = np.array([[[64, 64]], [[448, 64]], [[448, 448]], [[64, 448]]], np.int32)
    seg = TissueSegmentation(contours=[cont], holes=[[]], seg_level=0, downsample=1.0)
    return slide, seg


def test_vis_heatmap_basic(slide_and_seg):
    slide, seg = slide_and_seg
    coords = np.array([[64, 64], [192, 64], [64, 192], [192, 192]])
    scores = np.array([10.0, 50.0, 90.0, 100.0])  # raw [0, 100] scale
    out = vis_heatmap(
        slide, scores, coords, seg=seg, vis_level=0, patch_size=(128, 128),
        alpha=0.6, cmap="coolwarm",
    )
    assert out.shape == (512, 512, 3) and out.dtype == np.uint8
    # high-score patch turns warm (R>B), low-score cold (B>R) under coolwarm
    hot = out[192:320, 192:320].astype(int)
    cold = out[64:128, 64:128].astype(int)
    assert hot[..., 0].mean() > hot[..., 2].mean()
    assert cold[..., 2].mean() > cold[..., 0].mean()
    # pixels outside any patch footprint stay the blended slide (no colormap)
    corner = out[460:500, 460:500]
    assert abs(int(corner[..., 0].mean()) - int(corner[..., 2].mean())) < 20


def test_vis_heatmap_overlap_accumulation(slide_and_seg):
    slide, seg = slide_and_seg
    # two overlapping patches: the overlap pixel should average the scores
    coords = np.array([[64, 64], [128, 64]])
    scores = np.array([0.0, 100.0])
    out = vis_heatmap(
        slide, scores, coords, seg=seg, vis_level=0, patch_size=(128, 128),
        alpha=1.0, segment=False, blank_canvas=True,
    )
    left = out[96, 96].astype(int)       # only patch 1 (score 0)
    mid = out[96, 160].astype(int)       # overlap (mean 0.5)
    right = out[96, 224].astype(int)     # only patch 2 (score 1)
    assert left[2] > left[0]             # cold
    assert right[0] > right[2]           # warm
    assert abs(int(mid[0]) - int(mid[2])) < 60  # near-neutral in the overlap


def test_vis_heatmap_options(slide_and_seg):
    slide, seg = slide_and_seg
    coords = np.array([[64, 64], [192, 192], [320, 320]])
    scores = np.array([1.0, 2.0, 3.0])
    # percentiles + binarize + blur + downsample all execute
    out = vis_heatmap(
        slide, scores, coords, seg=seg, vis_level=0, patch_size=(128, 128),
        convert_to_percentiles=True, binarize=True, thresh=0.5, blur=True,
        custom_downsample=2,
    )
    assert out.shape == (256, 256, 3)
    out = vis_heatmap(
        slide, scores, coords, seg=None, segment=False, vis_level=0,
        patch_size=(128, 128), max_size=100,
    )
    assert max(out.shape[:2]) == 100
    # region crop
    out = vis_heatmap(
        slide, scores, coords, seg=seg, vis_level=0, patch_size=(128, 128),
        top_left=(64, 64), bot_right=(320, 320),
    )
    assert out.shape == (256, 256, 3)


def test_to_percentiles_and_screen():
    s = np.array([5.0, 1.0, 3.0])
    p = to_percentiles(s)
    assert np.argmax(p) == 0 and np.argmin(p) == 1
    assert p.max() == 100.0
    coords = np.array([[0, 0], [100, 100], [300, 300]])
    s2, c2 = screen_coords(s, coords, (50, 50), (200, 200))
    assert len(s2) == 1 and (c2 == [[100, 100]]).all()


def test_seg_mask_holes():
    cont = np.array([[[0, 0]], [[100, 0]], [[100, 100]], [[0, 100]]], np.int32)
    hole = np.array([[[40, 40]], [[60, 40]], [[60, 60]], [[40, 60]]], np.int32)
    seg = TissueSegmentation(contours=[cont], holes=[[hole]], seg_level=0, downsample=1.0)
    m = get_seg_mask(seg, (128, 128), 1.0, use_holes=True)
    assert m[20, 20] and not m[50, 50] and not m[120, 120]
    m2 = get_seg_mask(seg, (128, 128), 1.0, use_holes=False)
    assert m2[50, 50]


def test_iter_patches(slide_and_seg):
    slide, seg = slide_and_seg
    patches = list(iter_patches(slide, seg, patch_size=128, step_size=128,
                                white_black=True, white_thresh=15))
    assert len(patches) >= 4  # tissue block is 384² → 3×3 grid minus rejects
    for p in patches:
        assert p["patch"].shape == (128, 128, 3)
    # white filter: an all-white slide yields nothing
    white = ArraySlide(np.full((512, 512, 3), 255, np.uint8))
    assert list(iter_patches(white, seg, patch_size=128, step_size=128)) == []
    # custom_downsample=2 halves the emitted patch
    p2 = list(iter_patches(slide, seg, patch_size=128, step_size=128,
                           custom_downsample=2))
    if p2:
        assert p2[0]["patch"].shape == (128, 128, 3)


def test_white_black_filters():
    assert is_white_patch(np.full((8, 8, 3), 255, np.uint8))
    assert is_black_patch(np.zeros((8, 8, 3), np.uint8))
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0] = 200  # saturated red
    assert not is_white_patch(rgb)
    assert not is_black_patch(rgb)
