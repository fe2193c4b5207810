import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi
import pytest

from nuhtc_tpu.ops.watershed import edt, watershed, watershed_proposals_from_dist


def test_edt_matches_scipy():
    mask = np.zeros((48, 64), bool)
    mask[10:30, 12:40] = True
    mask[35:44, 50:60] = True
    got = np.asarray(edt(jnp.asarray(mask)))
    want = ndi.distance_transform_edt(mask)
    # JFA is exact for convex-ish shapes
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_edt_random_close_to_scipy(rng):
    mask = ndi.binary_dilation(rng.rand(64, 64) > 0.92, iterations=3)
    got = np.asarray(edt(jnp.asarray(mask)))
    want = ndi.distance_transform_edt(mask)
    # JFA can miss by a pixel in rare concave configurations
    assert np.abs(got - want).max() <= 1.5
    assert (np.abs(got - want) > 1e-3).mean() < 0.02


def test_watershed_two_basins():
    """Two touching circles: watershed on -EDT should split them."""
    h = w = 64
    yy, xx = np.mgrid[:h, :w]
    m1 = (yy - 32) ** 2 + (xx - 22) ** 2 <= 121
    m2 = (yy - 32) ** 2 + (xx - 42) ** 2 <= 121
    mask = m1 | m2
    dist = ndi.distance_transform_edt(mask)
    markers = np.zeros((h, w), np.int32)
    markers[32, 22] = 1
    markers[32, 42] = 2
    got = np.asarray(watershed(jnp.asarray(-dist), jnp.asarray(markers), jnp.asarray(mask)))
    # each center region gets its own label
    assert got[32, 18] == 1 and got[32, 46] == 2
    assert (got[mask] > 0).mean() > 0.9  # most pixels assigned
    # split near the touching line
    assert got[32, 27] == 1 and got[32, 37] == 2


def test_watershed_proposals_from_dist():
    h = w = 96
    yy, xx = np.mgrid[:h, :w]
    seg = np.full((h, w), -6.0, np.float32)
    dist = np.full((h, w), -6.0, np.float32)
    for cy, cx in [(30, 30), (30, 70), (70, 50)]:
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= 100
        seg[blob] = 6.0
        core = (yy - cy) ** 2 + (xx - cx) ** 2 <= 16
        dist[core] = 6.0
    boxes5, valid = watershed_proposals_from_dist(
        jnp.asarray(seg), jnp.asarray(dist), max_components=16
    )
    boxes5, valid = np.asarray(boxes5), np.asarray(valid)
    assert valid.sum() == 3
    for b in boxes5[valid]:
        assert b[4] == 1.0 and (b[2] - b[0]) > 10


def test_watershed_segmentation_matches_scipy_oracle():
    """_Lite_Fuse fallback: per-class blur→thr→open→fill→label→area filter
    must match the scipy formulation of the reference recipe
    (htc_roi_head_cus.py:3524-3563; no distance branch ⇒ CCL)."""
    from nuhtc_tpu.ops.watershed import watershed_segmentation
    from nuhtc_tpu.ops.morphology import gaussian_blur5

    h = w = 96
    yy, xx = np.mgrid[:h, :w]
    seg = np.full((h, w, 2), -6.0, np.float32)
    # class 0: three blobs (one too small to survive min_area)
    for cy, cx, r in [(25, 25, 11), (25, 70, 9), (70, 48, 3)]:
        seg[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r, 0] = 6.0
    # class 1: one large blob with a hole (fill_holes must close it)
    blob = (yy - 64) ** 2 + (xx - 24) ** 2 <= 144
    hole = (yy - 64) ** 2 + (xx - 24) ** 2 <= 4
    seg[blob & ~hole, 1] = 6.0

    boxes5, valid, inst, roots = watershed_segmentation(
        jnp.asarray(seg), max_instances=16, min_area=10
    )
    boxes5, valid, inst = np.asarray(boxes5), np.asarray(valid), np.asarray(inst)
    roots = np.asarray(roots)

    for c in range(2):
        m = np.asarray(gaussian_blur5(jnp.asarray(seg[..., c]))) > 0
        st = np.ones((5, 5), bool)
        m = ndi.binary_erosion(m, st, iterations=2)
        m = ndi.binary_dilation(m, st, iterations=2)
        m = ndi.binary_fill_holes(m)
        lab, n = ndi.label(m)  # 4-connected
        want = []
        for k in range(1, n + 1):
            area = (lab == k).sum()
            if 10 < area < h * w / 4:
                ys, xs = np.where(lab == k)
                want.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        got = boxes5[c][valid[c]]
        assert len(got) == len(want)
        np.testing.assert_allclose(
            sorted(got[:, :4].tolist()), sorted(want), atol=0
        )
        assert (got[:, 4] == np.float32(0.36)).all()
        # instance maps reproduce the surviving masks
        for b_idx in range(valid[c].sum()):
            im = inst[c] == roots[c][valid[c]][b_idx] + 1
            assert im.sum() > 10
