import numpy as np
import pytest

from nuhtc_tpu.ops import rle as R
from nuhtc_tpu.eval import stats as S


def random_mask(rng, h=50, w=40, p=0.3):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_native_lib_builds():
    from nuhtc_tpu.native.build import load_librle

    assert load_librle() is not None, "C librle failed to build"


def test_rle_roundtrip(rng):
    for _ in range(5):
        m = random_mask(rng)
        r = R.encode(m)
        back = R.decode(r)
        np.testing.assert_array_equal(m, back)
        assert R.area(r) == m.sum()


def test_rle_string_coding_matches_numpy(rng):
    m = random_mask(rng)
    r = R.encode(m)
    counts = R._counts_of(r)
    np.testing.assert_array_equal(counts, R._np_counts_from_mask(m))
    s = R._np_string_encode(counts)
    assert s == r["counts"]
    np.testing.assert_array_equal(R._np_string_decode(s), counts)


def test_rle_bbox(rng):
    m = np.zeros((30, 20), np.uint8)
    m[5:12, 3:9] = 1
    bb = R.toBbox(R.encode(m))
    np.testing.assert_allclose(bb, [3, 5, 6, 7])
    # spanning mask
    m2 = np.ones((10, 4), np.uint8)
    np.testing.assert_allclose(R.toBbox(R.encode(m2)), [0, 0, 4, 10])


def test_rle_iou_matches_dense(rng):
    masks_d = [random_mask(rng, 32, 32, 0.4) for _ in range(4)]
    masks_g = [random_mask(rng, 32, 32, 0.4) for _ in range(3)]
    got = R.iou([R.encode(m) for m in masks_d], [R.encode(m) for m in masks_g])
    d = np.stack([m.ravel() for m in masks_d]).astype(np.float64)
    g = np.stack([m.ravel() for m in masks_g]).astype(np.float64)
    inter = d @ g.T
    union = d.sum(1)[:, None] + g.sum(1)[None] - inter
    np.testing.assert_allclose(got, inter / union, rtol=1e-12)


def test_rle_iscrowd_iof(rng):
    d = random_mask(rng, 16, 16, 0.5)
    g = random_mask(rng, 16, 16, 0.5)
    got = R.iou([R.encode(d)], [R.encode(g)], iscrowd=[1])[0, 0]
    inter = np.logical_and(d, g).sum()
    assert got == pytest.approx(inter / d.sum())


# ---------------------------------------------------------------------- #
# metric oracles
# ---------------------------------------------------------------------- #
def _blob_map(centers, shape=(64, 64), r=5):
    lab = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    for i, (cy, cx) in enumerate(centers, 1):
        lab[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = i
    return lab


def test_pq_perfect_match():
    t = _blob_map([(10, 10), (30, 30), (50, 20)])
    [dq, sq, pq], _ = S.get_fast_pq(t, t.copy())
    assert dq == 1.0 and sq == pytest.approx(1.0, abs=1e-6) and pq == pytest.approx(1.0, abs=1e-6)
    assert S.get_fast_aji(t, t.copy()) == pytest.approx(1.0)
    assert S.get_fast_aji_plus(t, t.copy()) == pytest.approx(1.0)


def test_pq_missing_instance():
    t = _blob_map([(10, 10), (30, 30), (50, 20)])
    p = _blob_map([(10, 10), (30, 30)])
    [dq, sq, pq], [pt, pp, ut, up] = S.get_fast_pq(t, p)
    assert len(pt) == 2 and len(ut) == 1 and len(up) == 0
    assert dq == pytest.approx(2 / 2.5)
    assert pq == pytest.approx(dq * sq)


def test_pq_shifted_instance():
    t = _blob_map([(20, 20)], r=8)
    p = _blob_map([(20, 22)], r=8)  # shifted -> iou < 1 but > 0.5
    [dq, sq, pq], _ = S.get_fast_pq(t, p)
    assert dq == 1.0 and 0.5 < sq < 1.0


def test_aji_penalizes_split():
    t = _blob_map([(20, 20)], r=10)
    # split prediction into two halves
    p = t.copy()
    p[:, 21:] = np.where(t[:, 21:] > 0, 2, 0)
    aji = S.get_fast_aji(t, p)
    assert 0.3 < aji < 0.7


def test_stat_calc_keys():
    t = _blob_map([(10, 10)])
    res = S.stat_calc(t, t.copy())
    for k in ("aji", "aji_plus", "dq", "sq", "pq", "dice", "precision", "recall", "tp", "fp", "fn", "iou"):
        assert k in res
    assert res["tp"] == 1 and res["fp"] == 0 and res["fn"] == 0


def test_tables_agree_across_representations(rng):
    from nuhtc_tpu.ops import rle as R2

    t = _blob_map([(10, 10), (30, 30)])
    p = _blob_map([(11, 10), (40, 45)])
    tm = np.stack([(t == i).astype(np.uint8) for i in (1, 2)])
    pm = np.stack([(p == i).astype(np.uint8) for i in (1, 2)])
    a = S.tables_from_labelmaps(t, p)
    b = S.tables_from_masks(tm, pm)
    c = S.tables_from_rles([R2.encode(m) for m in tm], [R2.encode(m) for m in pm])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-9)
    for x, y in zip(a, c):
        np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-6)


def test_pair_coordinates():
    a = np.array([[0.0, 0.0], [10.0, 10.0], [30.0, 30.0]])
    b = np.array([[1.0, 1.0], [11.0, 10.0], [100.0, 100.0]])
    pairing, ua, ub = S.pair_coordinates(a, b, radius=6.0)
    assert len(pairing) == 2 and list(ua) == [2] and list(ub) == [2]
