import numpy as np
import jax.numpy as jnp

from nuhtc_tpu.ops import boxes as box_ops
from nuhtc_tpu.ops import nms as nms_ops
from nuhtc_tpu.ops import anchors as anchor_ops


def np_delta2bbox(rois, deltas, means, stds, max_shape=None, wh_ratio_clip=16 / 1000):
    means = np.asarray(means)
    stds = np.asarray(stds)
    d = deltas * stds + means
    dx, dy, dw, dh = d[:, 0], d[:, 1], d[:, 2], d[:, 3]
    mr = abs(np.log(wh_ratio_clip))
    dw = np.clip(dw, -mr, mr)
    dh = np.clip(dh, -mr, mr)
    px = (rois[:, 0] + rois[:, 2]) * 0.5
    py = (rois[:, 1] + rois[:, 3]) * 0.5
    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    out = np.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1)
    if max_shape:
        out[:, 0::2] = np.clip(out[:, 0::2], 0, max_shape[1])
        out[:, 1::2] = np.clip(out[:, 1::2], 0, max_shape[0])
    return out


def greedy_nms_ref(boxes, scores, thr):
    """O(N^2) numpy greedy NMS oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a1 + a2 - inter, 1e-10)
        suppressed |= iou > thr
        suppressed[i] = False  # keep itself
    return sorted(keep)


def random_boxes(rng, n, size=512, max_wh=80):
    xy = rng.uniform(0, size - max_wh, (n, 2))
    wh = rng.uniform(2, max_wh, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_delta2bbox_matches_numpy(rng):
    rois = random_boxes(rng, 64)
    deltas = rng.randn(64, 4).astype(np.float32) * 0.3
    means, stds = (0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)
    got = np.asarray(box_ops.delta2bbox(jnp.asarray(rois), jnp.asarray(deltas), means, stds, (512, 512)))
    want = np_delta2bbox(rois, deltas, means, stds, (512, 512))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_bbox2delta_roundtrip(rng):
    rois = random_boxes(rng, 32)
    gt = random_boxes(rng, 32)
    d = box_ops.bbox2delta(jnp.asarray(rois), jnp.asarray(gt), stds=(0.1, 0.1, 0.2, 0.2))
    back = box_ops.delta2bbox(jnp.asarray(rois), d, stds=(0.1, 0.1, 0.2, 0.2))
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


def test_bbox_overlaps(rng):
    a = random_boxes(rng, 20)
    b = random_boxes(rng, 30)
    got = np.asarray(box_ops.bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    # oracle
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    want = inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nms_exact_vs_oracle(rng):
    for n, thr in [(50, 0.5), (300, 0.5), (700, 0.7)]:
        boxes = random_boxes(rng, n, max_wh=120)
        scores = rng.rand(n).astype(np.float32)
        valid = np.ones(n, bool)
        ob, os_, oi, ov = nms_ops.nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr, max_out=n, tile=128
        )
        got = sorted(np.asarray(oi)[np.asarray(ov)].tolist())
        want = greedy_nms_ref(boxes, scores, thr)
        assert got == want, f"n={n} thr={thr}"


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 100)
    scores = rng.rand(100).astype(np.float32)
    valid = np.zeros(100, bool)
    valid[:40] = True
    _, _, oi, ov = nms_ops.nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 100)
    kept = np.asarray(oi)[np.asarray(ov)]
    assert kept.max() < 40
    want = greedy_nms_ref(boxes[:40], scores[:40], 0.5)
    assert sorted(kept.tolist()) == want


def test_batched_nms_separates_classes(rng):
    # identical boxes, different class ids -> both kept
    boxes = np.tile(random_boxes(rng, 5), (2, 1))
    scores = rng.rand(10).astype(np.float32)
    idxs = np.repeat([0, 1], 5)
    valid = np.ones(10, bool)
    _, _, oi, ov = nms_ops.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), jnp.asarray(valid),
        0.5, 10, coord_bound=512.0,
    )
    assert int(np.asarray(ov).sum()) == 10


def test_anchor_generation_matches_mmdet_convention():
    # base anchors for stride 4, scale 4, ratios [.5, 1, 2]
    base = anchor_ops.base_anchors(4, [4], [0.5, 1.0, 2.0])
    # ratio 0.5: h/w = sqrt(.5)/(1/sqrt(.5)) = 0.5 -> w = 4*4/sqrt(.5)... check areas ~ (4*4)^2
    areas = (base[:, 2] - base[:, 0]) * (base[:, 3] - base[:, 1])
    np.testing.assert_allclose(areas, [256, 256, 256], rtol=1e-5)
    ratios = (base[:, 3] - base[:, 1]) / (base[:, 2] - base[:, 0])
    np.testing.assert_allclose(ratios, [0.5, 1.0, 2.0], rtol=1e-5)
    # grid anchors
    lvl = anchor_ops.grid_anchors([(2, 3)], [4], [4], [1.0])[0]
    assert lvl.shape == (6, 4)
    np.testing.assert_allclose(lvl[1] - lvl[0], [4, 0, 4, 0])
    np.testing.assert_allclose(lvl[3] - lvl[0], [0, 4, 0, 4])
