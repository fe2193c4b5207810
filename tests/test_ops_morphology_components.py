import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from nuhtc_tpu.ops import morphology as M
from nuhtc_tpu.ops import components as C


def test_gaussian_kernel_matches_torchvision():
    import torch

    k = M.gaussian_kernel1d(5)
    sigma = 0.3 * ((5 - 1) * 0.5 - 1) + 0.8
    half = 2.0
    x = torch.linspace(-half, half, 5)
    pdf = torch.exp(-0.5 * (x / sigma) ** 2)
    want = (pdf / pdf.sum()).numpy()
    np.testing.assert_allclose(k, want, rtol=1e-6)


def test_gaussian_blur_matches_torchvision(rng):
    img = rng.randn(16, 20).astype(np.float32)
    got = np.asarray(M.gaussian_blur5(jnp.asarray(img)))
    # reflect-pad + separable conv oracle
    k = M.gaussian_kernel1d(5)
    pad = np.pad(img, 2, mode="reflect")
    tmp = np.zeros_like(pad)
    for i, kv in enumerate(k):
        tmp[:, 2:-2] += kv * pad[:, i : i + 20]
    out = np.zeros_like(img)
    for i, kv in enumerate(k):
        out += kv * tmp[i : i + 16, 2:-2]
    np.testing.assert_allclose(got, out, rtol=1e-4, atol=1e-5)


def test_binary_open_matches_reference_formulation(rng):
    import torch
    import torch.nn.functional as F

    mask = (rng.rand(1, 1, 32, 32) > 0.4).astype(np.float32)
    kernel = torch.ones((1, 1, 5, 5))

    def erosion(m, it):
        m = torch.from_numpy(m) if isinstance(m, np.ndarray) else m
        for _ in range(it):
            m = F.conv2d(m, kernel, padding=2)
            m = torch.clamp(m - kernel.sum() + 1, min=0, max=1)
        return m

    def dilate(m, it):
        for _ in range(it):
            m = F.conv2d(m, kernel, padding=2)
            m = torch.clamp(m, min=0, max=1)
        return m

    want = dilate(erosion(mask, 2), 2).numpy()[0, 0]
    got = np.asarray(M.binary_open(jnp.asarray(mask[0, 0]), 5, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fill_holes_matches_scipy(rng):
    mask = np.zeros((40, 40), bool)
    mask[5:20, 5:20] = True
    mask[8:12, 8:12] = False  # hole
    mask[25:35, 25:35] = True
    mask[30, 30] = False  # 1px hole
    mask[0:3, 35:40] = True  # touches border
    got = np.asarray(C and M.fill_holes(jnp.asarray(mask)))
    want = ndi.binary_fill_holes(mask)
    np.testing.assert_array_equal(got, want)

    rnd = (rng.rand(64, 64) > 0.6)
    got = np.asarray(M.fill_holes(jnp.asarray(rnd)))
    want = ndi.binary_fill_holes(rnd)
    np.testing.assert_array_equal(got, want)


def test_label_components_matches_scipy(rng):
    for seed in range(3):
        r = np.random.RandomState(seed)
        mask = ndi.binary_dilation(r.rand(64, 64) > 0.9, iterations=2)
        got = np.asarray(C.label_components(jnp.asarray(mask)))
        want, n = ndi.label(mask)  # default = 4-connectivity
        assert got.max() == n
        np.testing.assert_array_equal(got, want)


def test_component_boxes(rng):
    mask = np.zeros((32, 32), bool)
    mask[2:6, 3:9] = True  # comp 1: box (3, 2, 9, 6), area 24
    mask[20:30, 15:18] = True  # comp 2: box (15, 20, 18, 30), area 30
    labels = C.label_components(jnp.asarray(mask))
    boxes, areas, valid = C.component_boxes(labels, max_components=8)
    boxes, areas, valid = map(np.asarray, (boxes, areas, valid))
    assert valid[:2].all() and not valid[2:].any()
    np.testing.assert_allclose(boxes[0], [3, 2, 9, 6])
    np.testing.assert_allclose(boxes[1], [15, 20, 18, 30])
    assert areas[0] == 24 and areas[1] == 30


def test_resize_align_corners_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.randn(1, 1, 16, 16).astype(np.float32)
    got = np.asarray(C.resize_align_corners(jnp.asarray(x[0, 0]), (37, 41)))
    want = F.interpolate(torch.from_numpy(x), size=(37, 41), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got, want.numpy()[0, 0], rtol=1e-4, atol=1e-5)


def test_component_proposals_end_to_end(rng):
    # build a logit map with two blobs at 64x64, upsample path to 128x128
    logits = np.full((64, 64), -5.0, np.float32)
    logits[10:20, 10:20] = 5.0
    logits[40:55, 30:50] = 5.0
    boxes5, valid = C.component_proposals(jnp.asarray(logits), (128, 128), max_components=32)
    boxes5, valid = np.asarray(boxes5), np.asarray(valid)
    assert valid.sum() == 2
    assert (boxes5[valid][:, 4] == 1.0).all()
    # blobs roughly double in coordinates after 2x upsample
    b0 = boxes5[valid][0]
    assert 15 < b0[0] < 25 and 15 < b0[1] < 25


def test_boxes_from_roots_pallas_parity():
    """Pallas single-pass box kernel == XLA row-factored oracle (interpret
    mode; the TPU dispatch in boxes_from_roots shares this code path)."""
    import jax.numpy as jnp
    from nuhtc_tpu.ops.components import boxes_from_roots
    from nuhtc_tpu.ops.components_pallas import boxes_from_roots_pallas

    rng = np.random.RandomState(11)
    h, w = 64, 256
    lab = (rng.randint(0, 60, (h, w)) * 131) % (h * w)
    u = np.unique(lab)[:100]
    roots = np.concatenate([u, np.full(128 - len(u), h * w)]).astype(np.int32)
    b1, a1 = boxes_from_roots(jnp.asarray(lab.astype(np.int32)), jnp.asarray(roots))
    b2, a2 = boxes_from_roots_pallas(
        jnp.asarray(lab.astype(np.int32)), jnp.asarray(roots), interpret=True
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_boxes_from_roots_pallas_batched_parity():
    """Batch-grid kernel (ONE pallas_call for all B images) == per-image XLA
    oracle on every batch row — incl. the per-image stat re-init (the
    ``step == 0`` @pl.when must fire for EACH image as the grid's batch
    dimension advances, not just the first)."""
    import jax
    import jax.numpy as jnp
    from nuhtc_tpu.ops.components import boxes_from_roots
    from nuhtc_tpu.ops.components_pallas import boxes_from_roots_pallas_batched

    rng = np.random.RandomState(7)
    b, h, w = 3, 64, 256
    labs, rootss = [], []
    for i in range(b):
        lab = (rng.randint(0, 40 + 20 * i, (h, w)) * 131) % (h * w)
        u = np.unique(lab)[: 80 + i]
        roots = np.concatenate([u, np.full(128 - len(u), h * w)]).astype(np.int32)
        labs.append(lab.astype(np.int32))
        rootss.append(roots)
    labs = jnp.asarray(np.stack(labs))
    rootss = jnp.asarray(np.stack(rootss))
    bb, aa = boxes_from_roots_pallas_batched(labs, rootss, interpret=True)
    for i in range(b):
        b1, a1 = boxes_from_roots(labs[i], rootss[i])
        np.testing.assert_allclose(np.asarray(aa[i]), np.asarray(a1))
        np.testing.assert_allclose(np.asarray(bb[i]), np.asarray(b1))


def test_component_proposals_batched_matches_per_image():
    """component_proposals_batched (XLA path) == vmap'd component_proposals."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    logits = np.full((2, 64, 64), -5.0, np.float32)
    logits[0, 10:20, 10:20] = 5.0
    logits[0, 40:55, 30:50] = 5.0
    logits[1, 5:30, 5:30] = 5.0
    got_b, got_v = C.component_proposals_batched(
        jnp.asarray(logits), (128, 128), max_components=32
    )
    want_b, want_v = jax.vmap(
        lambda sl: C.component_proposals(sl, (128, 128), max_components=32)
    )(jnp.asarray(logits))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b))
