"""Compact WSI transfer paths: label-map paste vs full masks, and device
preprocessing vs the host cv2 pipeline."""

import numpy as np
import jax.numpy as jnp

from nuhtc_tpu.ops.mask_paste import paste_label_map, paste_masks


def _random_dets(rng, n, size):
    cx = rng.uniform(10, size - 10, n)
    cy = rng.uniform(10, size - 10, n)
    half = rng.uniform(4, 12, n)
    boxes = np.stack([cx - half, cy - half, cx + half, cy + half], -1).astype(np.float32)
    masks = rng.rand(n, 28, 28).astype(np.float32)
    masks = (masks * 0.3 + 0.55).astype(np.float32)  # mostly-on blobs
    return masks, boxes


def test_label_map_equals_first_covering_mask():
    rng = np.random.RandomState(0)
    n, size = 40, 128
    masks, boxes = _random_dets(rng, n, size)
    valid = np.ones(n, bool)
    valid[30:] = False  # padding slots must not paint

    full = np.asarray(paste_masks(jnp.asarray(masks), jnp.asarray(boxes), (size, size)))
    lab = np.asarray(
        paste_label_map(
            jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(valid), (size, size)
        )
    )
    # oracle: smallest valid det index covering each pixel (+1), else 0
    cover = full.astype(bool) & valid[:, None, None]
    any_cover = cover.any(axis=0)
    first = np.argmax(cover, axis=0)  # first True along det axis
    want = np.where(any_cover, first + 1, 0)
    np.testing.assert_array_equal(lab, want)
    # no invalid det ever appears
    assert lab.max() <= 30


def test_label_map_chunking_consistent():
    """Result must not depend on the scan chunk size."""
    rng = np.random.RandomState(1)
    n, size = 70, 96
    masks, boxes = _random_dets(rng, n, size)
    valid = np.ones(n, bool)
    a = np.asarray(paste_label_map(jnp.asarray(masks), jnp.asarray(boxes),
                                   jnp.asarray(valid), (size, size), chunk=16))
    b = np.asarray(paste_label_map(jnp.asarray(masks), jnp.asarray(boxes),
                                   jnp.asarray(valid), (size, size), chunk=128))
    np.testing.assert_array_equal(a, b)


def test_device_preprocess_matches_host():
    """resize_half_pixel + normalize ≈ cv2.INTER_LINEAR host pipeline."""
    import cv2  # noqa: F401  (env check)
    from nuhtc_tpu.data.pipelines import preprocess_test_image
    from nuhtc_tpu.ops.components import resize_half_pixel
    from nuhtc_tpu.data.pipelines import IMG_NORM

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    host = preprocess_test_image(img, scale_factor=2.0)

    x = jnp.asarray(img, jnp.float32).transpose(2, 0, 1)
    dev = np.asarray(resize_half_pixel(x, (128, 128))).transpose(1, 2, 0)
    dev = (dev - np.asarray(IMG_NORM["mean"], np.float32)) / np.asarray(
        IMG_NORM["std"], np.float32
    )
    # cv2 INTER_LINEAR uses 11-bit fixed-point weights → small rounding diffs
    np.testing.assert_allclose(dev, host, atol=0.02)


def test_paste_matches_torch_grid_sample():
    """paste_masks vs the reference _do_paste_mask formulation (mmdet
    fcn_mask_head.py:346-394: F.grid_sample(align_corners=False,
    padding_mode='zeros') over the box-normalized grid)."""
    import torch
    import torch.nn.functional as TF

    rng = np.random.RandomState(5)
    n, size, m = 12, 64, 28
    masks, boxes = _random_dets(rng, n, size)

    # torch oracle
    mt = torch.tensor(masks)[:, None]  # (N, 1, M, M)
    bt = torch.tensor(boxes)
    ys = torch.arange(size, dtype=torch.float32) + 0.5
    xs = torch.arange(size, dtype=torch.float32) + 0.5
    gy = (ys[None, :] - bt[:, 1:2]) / (bt[:, 3:4] - bt[:, 1:2]) * 2 - 1  # (N, H)
    gx = (xs[None, :] - bt[:, 0:1]) / (bt[:, 2:3] - bt[:, 0:1]) * 2 - 1
    grid = torch.stack(
        [gx[:, None, :].expand(n, size, size), gy[:, :, None].expand(n, size, size)], dim=3
    )
    want = TF.grid_sample(mt, grid, align_corners=False, padding_mode="zeros")[:, 0].numpy()

    got = np.asarray(
        paste_masks(jnp.asarray(masks), jnp.asarray(boxes), (size, size), threshold=-1.0)
    )
    # paste einsums run at Precision.HIGH (bf16x3) → ~1e-4 residual; far below
    # the 0.5 binarization threshold sensitivity
    np.testing.assert_allclose(got, want, atol=2e-3)
