"""Host-side data pipelines (cv2/numpy) — the mmdet pipeline equivalents.

Implements the transforms the reference configs use
(configs/nuhtc/...PanNuke...py:269-339): LoadImageFromFile/LoadAnnotations,
PhotoMetricDistortion, Resize(keep_ratio), RandomFlip(h/v/diagonal),
geometric RandTranslate/RandRotate/RandShear + RecomputeBox (reference
nuhtc/datasets/pipelines/rand_aug.py), Normalize, Pad(size_divisor),
SegRescale, and the MultiScaleFlipAug test wrapper (Resize ×2 + Normalize +
Pad). Everything operates on a ``results`` dict:
img (H,W,3 RGB f32), gt_bboxes (N,4), gt_labels (N,), gt_masks (N,H,W u8),
gt_semantic_seg (H,W u8).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import cv2
import numpy as np

from nuhtc_tpu.registry import PIPELINES

IMG_NORM = dict(mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375))


# --------------------------------------------------------------------------- #
# test-time
# --------------------------------------------------------------------------- #
def preprocess_test_image(
    img: np.ndarray,
    scale_factor: float = 2.0,
    mean=IMG_NORM["mean"],
    std=IMG_NORM["std"],
    size_divisor: int = 32,
) -> np.ndarray:
    """RGB uint8 (H, W, 3) → normalized, rescaled, padded float32."""
    h, w = img.shape[:2]
    if scale_factor != 1.0:
        img = cv2.resize(
            img, (int(w * scale_factor + 0.5), int(h * scale_factor + 0.5)),
            interpolation=cv2.INTER_LINEAR,
        )
    img = (img.astype(np.float32) - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    ph = (-img.shape[0]) % size_divisor
    pw = (-img.shape[1]) % size_divisor
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    return img


# --------------------------------------------------------------------------- #
# train transforms
# --------------------------------------------------------------------------- #
@PIPELINES.register()
class PhotoMetricDistortion:
    """Random brightness/contrast/saturation/hue (mmdet semantics)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=9):
        self.bd = brightness_delta
        self.cl, self.cu = contrast_range
        self.sl, self.su = saturation_range
        self.hd = hue_delta

    def __call__(self, results, rng: np.random.RandomState):
        img = results["img"].astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.bd, self.bd)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img *= rng.uniform(self.cl, self.cu)
        # draw the saturation/hue coin flips first and only round-trip
        # through uint8 HSV when one actually fires (mmdet converts lazily;
        # an unconditional round-trip would quantize the float brightness/
        # contrast results on every sample)
        do_sat = rng.randint(2)
        sat = rng.uniform(self.sl, self.su) if do_sat else 1.0
        do_hue = rng.randint(2)
        hue = rng.uniform(-self.hd, self.hd) if do_hue else 0.0
        if do_sat or do_hue:
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(np.float32)
            if do_sat:
                hsv[..., 1] *= sat
            if do_hue:
                hsv[..., 0] = (hsv[..., 0] + hue) % 180
            img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)
        if mode == 0 and rng.randint(2):
            img *= rng.uniform(self.cl, self.cu)
        results["img"] = np.clip(img, 0, 255)
        return results


@PIPELINES.register()
class Resize:
    def __init__(self, img_scale=(512, 512), keep_ratio=True):
        self.img_scale = img_scale
        self.keep_ratio = keep_ratio

    def __call__(self, results, rng=None, img_scale=None):
        # per-call override (Resize_Scale) — pipeline instances are shared by
        # all loader worker threads, so per-sample state must not live on self
        img_scale = img_scale if img_scale is not None else self.img_scale
        img = results["img"]
        h, w = img.shape[:2]
        if self.keep_ratio:
            scale = min(img_scale[0] / h, img_scale[1] / w)
            nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        else:
            nh, nw = img_scale
        sy, sx = nh / h, nw / w
        results["img"] = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        results["scale_factor"] = np.array([sx, sy, sx, sy], np.float32)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            results["gt_bboxes"] = results["gt_bboxes"] * results["scale_factor"]
        if "gt_masks" in results and len(results["gt_masks"]):
            results["gt_masks"] = np.stack(
                [cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST) for m in results["gt_masks"]]
            )
        if results.get("gt_semantic_seg") is not None:
            results["gt_semantic_seg"] = cv2.resize(
                results["gt_semantic_seg"], (nw, nh), interpolation=cv2.INTER_NEAREST
            )
        return results


@PIPELINES.register()
class RandomFlip:
    def __init__(self, flip_ratio=0.5, direction=("horizontal", "vertical", "diagonal")):
        self.flip_ratio = flip_ratio
        self.direction = [direction] if isinstance(direction, str) else list(direction)

    def __call__(self, results, rng: np.random.RandomState):
        if rng.rand() >= self.flip_ratio:
            return results
        d = self.direction[rng.randint(len(self.direction))]
        img = results["img"]
        h, w = img.shape[:2]

        def flip_img(x):
            if d == "horizontal":
                return np.ascontiguousarray(x[:, ::-1])
            if d == "vertical":
                return np.ascontiguousarray(x[::-1])
            return np.ascontiguousarray(x[::-1, ::-1])

        results["img"] = flip_img(img)
        if results.get("gt_semantic_seg") is not None:
            results["gt_semantic_seg"] = flip_img(results["gt_semantic_seg"])
        if "gt_masks" in results and len(results["gt_masks"]):
            results["gt_masks"] = np.stack([flip_img(m) for m in results["gt_masks"]])
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"].copy()
            if d in ("horizontal", "diagonal"):
                b[:, [0, 2]] = w - results["gt_bboxes"][:, [2, 0]]
                results["gt_bboxes"] = b.copy()
            if d in ("vertical", "diagonal"):
                b = results["gt_bboxes"].copy()
                b[:, [1, 3]] = h - results["gt_bboxes"][:, [3, 1]]
                results["gt_bboxes"] = b
        return results


def _warp_all(results, mat: np.ndarray, seg_ignore_label: int = 0):
    """Apply a 2×3 affine to img / masks / semantic / recompute boxes later."""
    img = results["img"]
    h, w = img.shape[:2]
    results["img"] = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR)
    if results.get("gt_semantic_seg") is not None:
        results["gt_semantic_seg"] = cv2.warpAffine(
            results["gt_semantic_seg"], mat, (w, h),
            flags=cv2.INTER_NEAREST, borderValue=seg_ignore_label,
        )
    if "gt_masks" in results and len(results["gt_masks"]):
        results["gt_masks"] = np.stack(
            [cv2.warpAffine(m, mat, (w, h), flags=cv2.INTER_NEAREST) for m in results["gt_masks"]]
        )
    return results


@PIPELINES.register()
class RandTranslate:
    def __init__(self, x=None, y=None, seg_ignore_label=0):
        self.x, self.y, self.ignore = x, y, seg_ignore_label

    def __call__(self, results, rng: np.random.RandomState):
        h, w = results["img"].shape[:2]
        tx = rng.uniform(*self.x) * w if self.x else 0.0
        ty = rng.uniform(*self.y) * h if self.y else 0.0
        mat = np.float32([[1, 0, tx], [0, 1, ty]])
        return _warp_all(results, mat, self.ignore)


@PIPELINES.register()
class RandRotate:
    def __init__(self, angle=(-10, 10), seg_ignore_label=0):
        self.angle, self.ignore = angle, seg_ignore_label

    def __call__(self, results, rng: np.random.RandomState):
        h, w = results["img"].shape[:2]
        a = rng.uniform(*self.angle)
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), a, 1.0)
        return _warp_all(results, mat.astype(np.float32), self.ignore)


@PIPELINES.register()
class RandShear:
    def __init__(self, x=None, y=None, seg_ignore_label=0):
        self.x, self.y, self.ignore = x, y, seg_ignore_label

    def __call__(self, results, rng: np.random.RandomState):
        sx = math.tan(math.radians(rng.uniform(*self.x))) if self.x else 0.0
        sy = math.tan(math.radians(rng.uniform(*self.y))) if self.y else 0.0
        mat = np.float32([[1, sx, 0], [sy, 1, 0]])
        return _warp_all(results, mat, self.ignore)


@PIPELINES.register()
class RecomputeBox:
    """Recompute gt boxes from warped masks; drop instances whose masks
    emptied (reference rand_aug.py:867). Every per-instance array
    (labels, ismask, ...) is filtered with the same keep set — a stale
    full-length ``ismask`` would misalign partial-supervision flags after a
    drop. Box-only trailing instances (fewer masks than boxes — the NuCLS
    partial state collate_train supports) keep their boxes untouched."""

    def __call__(self, results, rng=None):
        masks = results.get("gt_masks")
        if masks is None or len(masks) == 0:
            return results
        n_masked = len(masks)
        keep, boxes = [], []
        for i, m in enumerate(masks):
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                continue
            keep.append(i)
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        keep = np.asarray(keep, np.int64)
        n_orig = len(results["gt_bboxes"])
        tail = np.arange(n_masked, n_orig, dtype=np.int64)
        keep_all = np.concatenate([keep, tail])
        results["gt_masks"] = masks[keep] if len(keep) else masks[:0]
        new_boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        results["gt_bboxes"] = np.concatenate(
            [new_boxes, results["gt_bboxes"][tail]], axis=0
        ).astype(np.float32)
        results["gt_labels"] = results["gt_labels"][keep_all]
        if "ismask" in results and len(results["ismask"]) == n_orig:
            results["ismask"] = np.asarray(results["ismask"])[keep_all]
        return results


@PIPELINES.register()
class OneOf:
    def __init__(self, transforms: Sequence, rng_build=None):
        self.transforms = [build_transform(t) for t in transforms]

    def __call__(self, results, rng: np.random.RandomState):
        t = self.transforms[rng.randint(len(self.transforms))]
        if isinstance(t, list):
            for tt in t:
                results = tt(results, rng)
            return results
        return t(results, rng)


@PIPELINES.register()
class Sequential:
    def __init__(self, transforms: Sequence, record=False):
        self.transforms = [build_transform(t) for t in transforms]

    def __call__(self, results, rng: np.random.RandomState):
        for t in self.transforms:
            results = t(results, rng)
        return results


@PIPELINES.register()
class ShuffledSequential(Sequential):
    def __call__(self, results, rng: np.random.RandomState):
        order = rng.permutation(len(self.transforms))
        for i in order:
            results = self.transforms[i](results, rng)
        return results


def _corrupt_gaussian_noise(img, sev, rng):
    return np.clip(img.astype(np.float32) + rng.randn(*img.shape) * (4 + 4 * sev), 0, 255)


def _corrupt_shot_noise(img, sev, rng):
    lam = 60.0 / sev  # photons per unit intensity
    return np.clip(rng.poisson(img.astype(np.float32) / 255.0 * lam) / lam * 255.0, 0, 255)


def _corrupt_impulse_noise(img, sev, rng):
    out = img.astype(np.float32).copy()
    p = 0.01 * sev
    m = rng.rand(*img.shape[:2])
    out[m < p / 2] = 0.0
    out[(m >= p / 2) & (m < p)] = 255.0
    return out


def _corrupt_gaussian_blur(img, sev, rng):
    return cv2.GaussianBlur(img, (0, 0), 0.5 * sev)


def _corrupt_defocus_blur(img, sev, rng):
    r = sev + 1
    k = np.zeros((2 * r + 1, 2 * r + 1), np.float32)
    cv2.circle(k, (r, r), r, 1.0, -1)
    k /= k.sum()
    return cv2.filter2D(img, -1, k)


def _corrupt_motion_blur(img, sev, rng):
    n = 2 * sev + 3
    k = np.zeros((n, n), np.float32)
    k[n // 2, :] = 1.0 / n
    ang = rng.uniform(0, 180)
    rot = cv2.getRotationMatrix2D((n / 2 - 0.5, n / 2 - 0.5), ang, 1.0)
    k = cv2.warpAffine(k, rot, (n, n))
    k /= max(k.sum(), 1e-6)
    return cv2.filter2D(img, -1, k)


def _corrupt_zoom_blur(img, sev, rng):
    h, w = img.shape[:2]
    acc = img.astype(np.float32).copy()
    cnt = 1
    for z in np.arange(1.0, 1.0 + 0.04 * sev, 0.01)[1:]:
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        big = cv2.resize(img, (zw, zh))
        y0, x0 = (zh - h) // 2, (zw - w) // 2
        acc += big[y0 : y0 + h, x0 : x0 + w].astype(np.float32)
        cnt += 1
    return np.clip(acc / cnt, 0, 255)


def _corrupt_jpeg(img, sev, rng):
    q = max(10, 60 - 12 * sev)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def _corrupt_pixelate(img, sev, rng):
    h, w = img.shape[:2]
    f = 1.0 - 0.15 * sev
    small = cv2.resize(img, (max(1, int(w * f)), max(1, int(h * f))))
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def _corrupt_brightness(img, sev, rng):
    return np.clip(img.astype(np.float32) + 20.0 * sev, 0, 255)


def _corrupt_contrast(img, sev, rng):
    f = 1.0 - 0.15 * sev
    mean = img.astype(np.float32).mean(axis=(0, 1), keepdims=True)
    return np.clip((img.astype(np.float32) - mean) * f + mean, 0, 255)


def _corrupt_saturate(img, sev, rng):
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * (1.0 + 0.2 * sev), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def _corrupt_speckle_noise(img, sev, rng):
    # multiplicative gaussian noise (imagecorruptions speckle_noise)
    f = img.astype(np.float32)
    return np.clip(f + f * rng.randn(*img.shape) * (0.06 + 0.04 * sev), 0, 255)


def _corrupt_glass_blur(img, sev, rng):
    # local pixel shuffling then a light blur (imagecorruptions glass_blur)
    out = cv2.GaussianBlur(img, (0, 0), 0.3 + 0.2 * sev)
    h, w = out.shape[:2]
    d = sev  # max displacement
    for _ in range(2):
        dx = rng.randint(-d, d + 1, (h, w))
        dy = rng.randint(-d, d + 1, (h, w))
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        sx = np.clip(xx + dx, 0, w - 1)
        sy = np.clip(yy + dy, 0, h - 1)
        out = out[sy, sx]
    return cv2.GaussianBlur(out, (0, 0), 0.3 + 0.2 * sev)


def _plasma(h, w, rng, roughness=0.8):
    """Diamond-square-style fractal cloud in [0,1] (fog/frost base)."""
    size = 1
    while size < max(h, w):
        size *= 2
    grid = rng.rand(2, 2).astype(np.float32)
    scale = 1.0
    while grid.shape[0] < size + 1:
        n = (grid.shape[0] - 1) * 2 + 1
        up = cv2.resize(grid, (n, n), interpolation=cv2.INTER_LINEAR)
        scale *= roughness
        grid = up + (rng.rand(n, n).astype(np.float32) - 0.5) * scale
    g = grid[:h, :w]
    g -= g.min()
    return g / max(g.max(), 1e-6)


def _corrupt_fog(img, sev, rng):
    h, w = img.shape[:2]
    fog = _plasma(h, w, rng)[..., None]
    amount = 0.12 * sev
    f = img.astype(np.float32) / 255.0
    out = f * (1 - amount * fog) + amount * fog * 0.9
    return np.clip(out * 255.0, 0, 255)


def _corrupt_frost(img, sev, rng):
    # procedural crystalline overlay: thresholded sharpened plasma texture
    # (imagecorruptions composites shipped frost photographs; this framework
    # has no asset files, so the texture is synthesized)
    h, w = img.shape[:2]
    tex = _plasma(h, w, rng, roughness=0.9)
    crystal = np.clip((tex - 0.55) * 4.0, 0, 1)[..., None]
    amount = 0.1 + 0.08 * sev
    f = img.astype(np.float32) / 255.0
    out = f * (1 - amount * crystal) + amount * crystal * np.array([0.9, 0.95, 1.0])
    return np.clip(out * 255.0, 0, 255)


def _corrupt_snow(img, sev, rng):
    # sparse bright specks, motion-blurred into flakes, plus a whitening veil
    h, w = img.shape[:2]
    layer = (rng.rand(h, w) < 0.002 * sev).astype(np.float32)
    n = 2 * sev + 5
    k = np.zeros((n, n), np.float32)
    k[:, n // 2] = 1.0
    rot = cv2.getRotationMatrix2D((n / 2 - 0.5, n / 2 - 0.5), rng.uniform(-30, 30), 1.0)
    k = cv2.warpAffine(k, rot, (n, n))
    k /= max(k.sum(), 1e-6)
    flakes = np.clip(cv2.filter2D(layer, -1, k) * n * 0.8, 0, 1)[..., None]
    f = img.astype(np.float32) / 255.0
    veil = 0.04 * sev
    out = (f * (1 - veil) + veil) * (1 - flakes) + flakes
    return np.clip(out * 255.0, 0, 255)


def _corrupt_spatter(img, sev, rng):
    # liquid blobs: blurred noise thresholded into droplets (imagecorruptions
    # spatter's water mode), darkening where they land
    h, w = img.shape[:2]
    liquid = cv2.GaussianBlur(rng.rand(h, w).astype(np.float32), (0, 0), 3.0)
    thr = 1.0 - 0.04 * sev - 0.62
    m = np.clip((liquid - thr) * 8.0, 0, 1)[..., None]
    f = img.astype(np.float32) / 255.0
    tint = f * np.array([0.75, 0.85, 0.95])
    out = f * (1 - 0.6 * m) + tint * (0.6 * m)
    return np.clip(out * 255.0, 0, 255)


def _corrupt_elastic(img, sev, rng):
    h, w = img.shape[:2]
    alpha = 2.0 * sev
    dx = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), 8) * alpha
    dy = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), 8) * alpha
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return cv2.remap(img, xx + dx, yy + dy, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


# name → fn, the full 19-type imagecorruptions catalog (reference
# rand_aug.py:979 + test_robustness). frost synthesizes its crystalline
# texture procedurally (the upstream package ships photographs; no asset
# files in this framework).
CORRUPTIONS = {
    "gaussian_noise": _corrupt_gaussian_noise,
    "shot_noise": _corrupt_shot_noise,
    "impulse_noise": _corrupt_impulse_noise,
    "speckle_noise": _corrupt_speckle_noise,
    "gaussian_blur": _corrupt_gaussian_blur,
    "glass_blur": _corrupt_glass_blur,
    "defocus_blur": _corrupt_defocus_blur,
    "motion_blur": _corrupt_motion_blur,
    "zoom_blur": _corrupt_zoom_blur,
    "snow": _corrupt_snow,
    "frost": _corrupt_frost,
    "fog": _corrupt_fog,
    "spatter": _corrupt_spatter,
    "jpeg_compression": _corrupt_jpeg,
    "pixelate": _corrupt_pixelate,
    "brightness": _corrupt_brightness,
    "contrast": _corrupt_contrast,
    "saturate": _corrupt_saturate,
    "elastic_transform": _corrupt_elastic,
}

# reference test_robustness.py corruption groups (:99-110 choices +
# mmdet's get_corruption lists)
CORRUPTION_GROUPS = {
    "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
    "blur": ["defocus_blur", "glass_blur", "motion_blur", "zoom_blur"],
    "weather": ["snow", "frost", "fog", "brightness"],
    "digital": ["contrast", "elastic_transform", "pixelate", "jpeg_compression"],
    "holdout": ["speckle_noise", "gaussian_blur", "spatter", "saturate"],
}
CORRUPTION_GROUPS["benchmark"] = (
    CORRUPTION_GROUPS["noise"] + CORRUPTION_GROUPS["blur"]
    + CORRUPTION_GROUPS["weather"] + CORRUPTION_GROUPS["digital"]
)
CORRUPTION_GROUPS["all"] = CORRUPTION_GROUPS["benchmark"] + CORRUPTION_GROUPS["holdout"]


@PIPELINES.register()
class RandCorrupt:
    """Image-corruption augmentation (reference rand_aug.py:979 uses the
    ``imagecorruptions`` package, absent here — CORRUPTIONS above implements
    13 of its 15 corruption types with cv2/numpy)."""

    def __init__(self, prob=0.5, severity=1, corruption=None, corruptions=None):
        """Reference signature (rand_aug.py:995): ``corruption`` is None
        (all types), a name, or a list; ``severity`` a fixed int (default 1).
        A (lo, hi) severity tuple additionally samples a range."""
        self.prob = prob
        self.severity = (severity, severity) if isinstance(severity, int) else tuple(severity)
        names = corruption if corruption is not None else corruptions
        if isinstance(names, str):
            names = [names]
        self.names = [n for n in (names or CORRUPTIONS) if n in CORRUPTIONS]

    def __call__(self, results, rng: np.random.RandomState):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255).astype(np.uint8)
        sev = rng.randint(self.severity[0], self.severity[1] + 1)
        name = self.names[rng.randint(len(self.names))]
        img = CORRUPTIONS[name](img, sev, rng)
        results["img"] = np.clip(img, 0, 255).astype(np.float32)
        return results


@PIPELINES.register()
class RandPosterize:
    """Bit-depth reduction (reference rand_aug.py:202 RandPosterize:
    PIL ImageOps.posterize to ``4 - magnitude`` bits)."""

    def __init__(self, prob=0.5, magnitude_limit=4):
        self.prob = prob
        self.magnitude_limit = magnitude_limit

    def __call__(self, results, rng: np.random.RandomState):
        if rng.rand() >= self.prob:
            return results
        magnitude = rng.randint(0, self.magnitude_limit + 1)
        bits = max(4 - magnitude, 1)
        keep = np.uint8(0xFF & ~((1 << (8 - bits)) - 1))
        img = np.clip(results["img"], 0, 255).astype(np.uint8)
        results["img"] = (img & keep).astype(np.float32)
        return results


@PIPELINES.register()
class Normalize:
    def __init__(self, mean=IMG_NORM["mean"], std=IMG_NORM["std"], to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, results, rng=None):
        results["img"] = (results["img"].astype(np.float32) - self.mean) / self.std
        return results


@PIPELINES.register()
class Pad:
    def __init__(self, size_divisor=32):
        self.d = size_divisor

    def __call__(self, results, rng=None):
        img = results["img"]
        ph = (-img.shape[0]) % self.d
        pw = (-img.shape[1]) % self.d
        if ph or pw:
            results["img"] = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            if results.get("gt_semantic_seg") is not None:
                results["gt_semantic_seg"] = np.pad(
                    results["gt_semantic_seg"], ((0, ph), (0, pw))
                )
            if "gt_masks" in results and len(results["gt_masks"]):
                results["gt_masks"] = np.pad(
                    results["gt_masks"], ((0, 0), (0, ph), (0, pw))
                )
        return results


@PIPELINES.register()
class SegRescale:
    def __init__(self, scale_factor=0.25):
        self.f = scale_factor

    def __call__(self, results, rng=None):
        seg = results.get("gt_semantic_seg")
        if seg is not None:
            h, w = seg.shape
            results["gt_semantic_seg"] = cv2.resize(
                seg, (int(w * self.f), int(h * self.f)), interpolation=cv2.INTER_NEAREST
            )
        return results


_SKIP = {"LoadImageFromFile", "LoadAnnotations", "CusLoadAnnotations",
         "DefaultFormatBundle", "Collect", "MultiScaleFlipAug", "ImageToTensor"}


def build_transform(cfg):
    if isinstance(cfg, list):
        return [build_transform(c) for c in cfg]
    cfg = dict(cfg)
    typ = cfg.pop("type")
    if typ in _SKIP:
        return None
    return PIPELINES.get(typ)(**cfg)


def build_train_pipeline(cfgs: List[dict]) -> List:
    out = []
    for c in cfgs:
        t = build_transform(c)
        if t is not None:
            out.append(t)
    return out


def run_pipeline(transforms: List, results: dict, rng: np.random.RandomState) -> Optional[dict]:
    """A transform returning None (RandomCrop/CusRandomCrop with no gt in
    the crop, allow_negative_crop=False) aborts the sample — the caller
    re-samples another index (mmdet CustomDataset.__getitem__ loop)."""
    for t in transforms:
        results = t(results, rng)
        if results is None:
            return None
    return results


# --------------------------------------------------------------------------- #
# color ops + resize variants + semi-sup wrappers (reference rand_aug.py:120-263,
# resize_scale.py, MultiBranch rand_aug.py:1038)
# --------------------------------------------------------------------------- #
@PIPELINES.register()
class AutoContrast:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255)
        lo, hi = img.min(), img.max()
        if hi > lo:
            results["img"] = (img - lo) * (255.0 / (hi - lo))
        return results


@PIPELINES.register()
class RandEqualize:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255).astype(np.uint8)
        chans = [cv2.equalizeHist(img[..., c]) for c in range(3)]
        results["img"] = np.stack(chans, -1).astype(np.float32)
        return results


@PIPELINES.register()
class RandSolarize:
    def __init__(self, prob=0.5, threshold=128):
        self.prob, self.threshold = prob, threshold

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255)
        thr = rng.uniform(0, self.threshold) if hasattr(self.threshold, "__len__") is False else self.threshold
        results["img"] = np.where(img >= thr, 255.0 - img, img)
        return results


@PIPELINES.register()
class RandColor:
    """Random color jitter towards grayscale (PIL Color enhance analog)."""

    def __init__(self, prob=0.5, factor=(0.5, 1.5)):
        self.prob, self.factor = prob, factor

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255)
        gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY).astype(np.float32)[..., None]
        f = rng.uniform(*self.factor)
        results["img"] = np.clip(gray + f * (img - gray), 0, 255)
        return results


@PIPELINES.register()
class RandBrightness:
    def __init__(self, prob=0.5, factor=(0.5, 1.5)):
        self.prob, self.factor = prob, factor

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        results["img"] = np.clip(results["img"] * rng.uniform(*self.factor), 0, 255)
        return results


@PIPELINES.register()
class RandContrast:
    def __init__(self, prob=0.5, factor=(0.5, 1.5)):
        self.prob, self.factor = prob, factor

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255)
        mean = img.mean()
        results["img"] = np.clip(mean + rng.uniform(*self.factor) * (img - mean), 0, 255)
        return results


@PIPELINES.register()
class RandSharpness:
    def __init__(self, prob=0.5, factor=(0.0, 2.0)):
        self.prob, self.factor = prob, factor

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = np.clip(results["img"], 0, 255).astype(np.float32)
        blur = cv2.GaussianBlur(img, (3, 3), 0)
        f = rng.uniform(*self.factor)
        results["img"] = np.clip(blur + f * (img - blur), 0, 255)
        return results


@PIPELINES.register()
class RandErase:
    """Random rectangular cutout patches (reference rand_aug.py RandErase
    :770-863): the patch is erased from the image (fill 128), from every
    gt mask (fill 0), and from the semantic seg (fill 0) — GT must not
    supervise nuclei inside featureless cutouts."""

    def __init__(self, prob=0.7, n_iterations=(1, 5), size=(0.0, 0.2),
                 squared=True, img_fill_val=128):
        self.prob, self.n_iterations, self.size, self.squared = prob, n_iterations, size, squared
        self.img_fill_val = img_fill_val

    def __call__(self, results, rng):
        if rng.rand() >= self.prob:
            return results
        img = results["img"]
        h, w = img.shape[:2]
        n = rng.randint(self.n_iterations[0], self.n_iterations[1] + 1)
        for _ in range(n):
            sw = rng.uniform(*self.size)
            sh = sw if self.squared else rng.uniform(*self.size)
            ph, pw = max(int(h * sh), 1), max(int(w * sw), 1)
            y0, x0 = rng.randint(0, max(h - ph, 1)), rng.randint(0, max(w - pw, 1))
            img[y0 : y0 + ph, x0 : x0 + pw] = self.img_fill_val
            masks = results.get("gt_masks")
            if masks is not None and len(masks):
                masks[:, y0 : y0 + ph, x0 : x0 + pw] = 0
            seg = results.get("gt_semantic_seg")
            if seg is not None:
                seg[y0 : y0 + ph, x0 : x0 + pw] = 0
        results["img"] = img
        return results


@PIPELINES.register()
class Resize_Scale(Resize):
    """Resize by a fixed scale factor (reference resize_scale.py)."""

    def __init__(self, scale_factor=2.0):
        self.scale_factor = scale_factor
        self.img_scale = None
        self.keep_ratio = True

    def __call__(self, results, rng=None):
        h, w = results["img"].shape[:2]
        target = (int(h * self.scale_factor + 0.5), int(w * self.scale_factor + 0.5))
        return super().__call__(results, rng, img_scale=target)


@PIPELINES.register()
class SmartResize(Resize):
    """Resize to target with aspect-preserving choice of scale per image."""


def _crop_instances(results, y0, x0, ch, cw, allow_negative_crop=False):
    """Crop img/masks/semantic to ``[y0:y0+ch, x0:x0+cw]`` with mmdet
    ``RandomCrop._crop_data`` semantics (reference
    nuhtc/datasets/pipelines/resize_scale.py:230-296): boxes shift into the
    crop frame and clip to its border; instances whose boxes become
    degenerate are dropped (labels/masks/ismask filtered with the same keep
    set); returns None when no gt box survives and ``allow_negative_crop``
    is False (the dataset then re-samples another image, mmdet
    CustomDataset.__getitem__ semantics).

    Handles the NuCLS partial-supervision state where ``gt_masks`` is a
    prefix of ``gt_bboxes`` (box-only instances trail) — keep indices are
    sorted, so kept masked instances stay ahead of kept box-only ones and
    the prefix invariant holds.
    """

    def crop(x):
        return np.ascontiguousarray(x[y0 : y0 + ch, x0 : x0 + cw])

    boxes = results.get("gt_bboxes")
    if boxes is not None and len(boxes):
        b = boxes - np.array([x0, y0, x0, y0], np.float32)
        b[:, 0::2] = np.clip(b[:, 0::2], 0, cw)
        b[:, 1::2] = np.clip(b[:, 1::2], 0, ch)
        valid = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        if not valid.any() and not allow_negative_crop:
            return None
        keep = np.nonzero(valid)[0]
        results["gt_bboxes"] = b[keep].astype(np.float32)
        if "gt_labels" in results and len(results["gt_labels"]) == len(boxes):
            results["gt_labels"] = np.asarray(results["gt_labels"])[keep]
        if "ismask" in results and results["ismask"] is not None and len(
            results["ismask"]
        ) == len(boxes):
            results["ismask"] = np.asarray(results["ismask"])[keep]
        masks = results.get("gt_masks")
        if masks is not None and len(masks):
            mask_keep = keep[keep < len(masks)]
            results["gt_masks"] = (
                np.stack([crop(masks[i]) for i in mask_keep])
                if len(mask_keep)
                else masks[:0, y0 : y0 + ch, x0 : x0 + cw]
            )
    results["img"] = crop(results["img"])
    if results.get("gt_semantic_seg") is not None:
        results["gt_semantic_seg"] = crop(results["gt_semantic_seg"])
    return results


@PIPELINES.register()
class RandomCrop:
    """mmdet RandomCrop (absolute crop_type — the only one the reference
    configs use; CoNIC trains with ``RandomCrop(128, 128)`` as the first
    transform, configs/nuhtc/htc_lite_swin_pytorch_fpn_CoNIC_seasaw_CAS.py:272).
    If the image is smaller than the crop size, crops to the image size
    (i.e. no-op on that axis). Returns None when the crop contains no gt
    box and ``allow_negative_crop`` is False."""

    def __init__(self, crop_size=(256, 256), crop_type="absolute",
                 allow_negative_crop=False, bbox_clip_border=True):
        if crop_type != "absolute":
            raise NotImplementedError(
                f"crop_type={crop_type!r}: only 'absolute' is used by the "
                "reference configs"
            )
        assert bbox_clip_border, "bbox_clip_border=False unused by reference"
        self.crop_size = crop_size
        self.allow_negative_crop = _truthy(allow_negative_crop)

    def __call__(self, results, rng):
        h, w = results["img"].shape[:2]
        ch, cw = min(self.crop_size[0], h), min(self.crop_size[1], w)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        return _crop_instances(results, y0, x0, ch, cw, self.allow_negative_crop)


def _truthy(v):
    # reference configs pass allow_negative_crop='True' (a string) —
    # NuCLS config :271; bool('True') semantics, not ast parsing
    return bool(v)


@PIPELINES.register()
class CusRandomCrop(RandomCrop):
    """Reference CusRandomCrop (resize_scale.py:167): mmdet RandomCrop plus
    ismask filtering (handled by _crop_instances for every crop here)."""


@PIPELINES.register()
class FOVCrop:
    """Crop to the image's annotated field-of-view rectangle (reference
    resize_scale.py:356-425: ``results['img_info']['fovloc']`` = (x1, y1,
    x2, y2), the NuCLS QC region). Images without a fovloc record pass
    through unchanged (the reference would KeyError; NuCLS jsons always
    carry it)."""

    def __init__(self, allow_negative_crop=False, bbox_clip_border=True):
        self.allow_negative_crop = _truthy(allow_negative_crop)

    def __call__(self, results, rng=None):
        fovloc = (results.get("img_info") or {}).get("fovloc")
        if fovloc is None:
            return results
        x1, y1, x2, y2 = (int(v) for v in fovloc)
        h, w = results["img"].shape[:2]
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(max(x2, x1 + 1), w), min(max(y2, y1 + 1), h)
        return _crop_instances(
            results, y1, x1, y2 - y1, x2 - x1, self.allow_negative_crop
        )


@PIPELINES.register()
class MultiBranch:
    """Produce multiple augmented views of one sample (semi-supervised
    teacher/student; reference rand_aug.py:1038). Returns a dict of branches."""

    def __init__(self, **branches):
        self.branches = {k: build_train_pipeline(v) for k, v in branches.items()}

    def __call__(self, results, rng):
        import copy

        return {
            name: run_pipeline(p, copy.deepcopy(results), rng)
            for name, p in self.branches.items()
        }
