import numpy as np
import jax.numpy as jnp

from nuhtc_tpu.ops.roi_align import roi_align, attention_pool


def roi_align_ref(feat_chw, rois, spatial_scale, out_size, sampling_ratio):
    """Scalar numpy oracle for mmcv RoIAlign(aligned=True, avg)."""
    c, h, w = feat_chw.shape
    n = rois.shape[0]
    out = np.zeros((n, c, out_size, out_size), np.float64)

    def bilinear(ch, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return 0.0
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low = int(y)
        x_low = int(x)
        if y_low >= h - 1:
            y_low = y_high = h - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= w - 1:
            x_low = x_high = w - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        v = feat_chw[ch]
        return (
            hy * hx * v[y_low, x_low]
            + hy * lx * v[y_low, x_high]
            + ly * hx * v[y_high, x_low]
            + ly * lx * v[y_high, x_high]
        )

    for i, roi in enumerate(rois):
        sw = roi[0] * spatial_scale - 0.5
        sh = roi[1] * spatial_scale - 0.5
        ew = roi[2] * spatial_scale - 0.5
        eh = roi[3] * spatial_scale - 0.5
        rw, rh = ew - sw, eh - sh
        bw, bh = rw / out_size, rh / out_size
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / out_size))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / out_size))
        gh, gw = max(gh, 1), max(gw, 1)
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(c)
                for iy in range(gh):
                    yy = sh + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = sw + pw * bw + (ix + 0.5) * bw / gw
                        for ch in range(c):
                            acc[ch] += bilinear(ch, yy, xx)
                out[i, :, ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_fixed_ratio(rng):
    h, w, c = 24, 32, 3
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array(
        [
            [4.0, 4.0, 20.0, 16.0],
            [0.0, 0.0, 31.0, 23.0],
            [10.5, 3.2, 14.9, 9.8],
            [-2.0, -2.0, 5.0, 5.0],  # partially outside
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, sampling_ratio=2, exact=True))
    want = roi_align_ref(feat.transpose(2, 0, 1), rois, 1.0, 7, 2).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_ratio(rng):
    h, w, c = 16, 16, 2
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array(
        [
            [2.0, 2.0, 60.0, 50.0],  # large roi (scale .25 -> 12x15 feature extent)
            [8.0, 8.0, 20.0, 20.0],
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, sampling_ratio=0, max_grid=8, exact=True)
    )
    want = roi_align_ref(feat.transpose(2, 0, 1), rois, 0.25, 7, 0).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_spatial_scale_stride8(rng):
    feat = rng.randn(8, 8, 4).astype(np.float32)
    rois = np.array([[5.0, 9.0, 40.0, 33.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1 / 8, 7, sampling_ratio=2, exact=True))
    want = roi_align_ref(feat.transpose(2, 0, 1), rois, 1 / 8, 7, 2).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_chunked_equals_unchunked(rng):
    feat = rng.randn(16, 16, 8).astype(np.float32)
    n = 70
    xy = rng.uniform(0, 40, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 20, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy, xy + wh], 1)
    a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2, chunk=32, exact=True))
    b = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2, chunk=256, exact=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_attention_pool_matches_torch_formula(rng):
    import torch
    import torch.nn.functional as F

    h, w, c = 8, 8, 16
    stride = 16
    thres = 0.965926
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array([[10.0, 20.0, 60.0, 70.0], [100.0, 90.0, 120.0, 110.0]], np.float32)

    got = np.asarray(attention_pool(jnp.asarray(feat), jnp.asarray(rois), stride, thres, exact=True))

    # torch oracle — reference formulation (roi_extractors_cus.py:216-245)
    tf = torch.from_numpy(feat.transpose(2, 0, 1))[None]  # (1, C, H, W)
    trois = torch.from_numpy(rois)
    roi_x = torch.div((trois[:, 0] + trois[:, 2]), 2 * stride, rounding_mode="floor").clamp(0, w - 1)
    roi_y = torch.div((trois[:, 1] + trois[:, 3]), 2 * stride, rounding_mode="floor").clamp(0, h - 1)
    roi_vec = tf[0, :, roi_y.long(), roi_x.long()].T  # (R, C)
    feat_vec = tf[0].permute(1, 2, 0).reshape(-1, c)  # (HW, C)
    sim = F.relu(F.cosine_similarity(roi_vec.unsqueeze(1), feat_vec.unsqueeze(0), dim=2) - thres) + thres
    sim = sim.view(-1, 1, h, w)  # (R, 1, H, W)
    want = torch.mean(tf[0].unsqueeze(0) * sim, dim=(2, 3)).numpy()  # (R, C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_bf16_fast_mode_close(rng):
    feat = rng.randn(16, 16, 8).astype(np.float32)
    rois = np.array([[4.0, 4.0, 40.0, 40.0], [8.0, 12.0, 30.0, 50.0]], np.float32)
    ex = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2, exact=True))
    fast = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2, exact=False))
    # bf16 inputs: ~0.4%% relative error bound
    np.testing.assert_allclose(fast, ex, rtol=0.05, atol=0.02)


def test_roi_align_pool_from_equals_pool_of_fine(rng):
    """pool_from=14→7 must equal adaptive_avg_pool2d(RoIAlign(14, sr0), 7)."""
    feat = rng.randn(32, 32, 4).astype(np.float32)
    rois = np.array(
        [[4.0, 4.0, 60.0, 50.0], [10.0, 20.0, 100.0, 90.0], [0.0, 0.0, 127.0, 127.0]],
        np.float32,
    )
    fine = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 14, sampling_ratio=0, exact=True)
    )
    pooled = fine.reshape(-1, 7, 2, 7, 2, 4).mean(axis=(2, 4))
    fused = np.asarray(
        roi_align(
            jnp.asarray(feat), jnp.asarray(rois), 0.25, 7,
            sampling_ratio=0, pool_from=14, exact=True,
        )
    )
    np.testing.assert_allclose(fused, pooled, rtol=1e-4, atol=1e-5)
