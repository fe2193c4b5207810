"""Dataset + evaluate pipeline tests on a synthetic COCO dataset."""

import json
import os

import numpy as np
import pytest

from nuhtc_tpu.ops import rle as R
from nuhtc_tpu.eval.evaluate import evaluate_dataset, mask_nms, convert_format


def make_blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco")
    img_dir = d / "imgs"
    img_dir.mkdir()
    import cv2

    h = w = 64
    images, annotations = [], []
    gt = {}
    aid = 1
    for img_id in range(3):
        rng = np.random.RandomState(img_id)
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{img_id}.png"), img)
        images.append(dict(id=img_id, file_name=f"im{img_id}.png", height=h, width=w))
        inst = []
        centers = [(12, 12), (32, 40), (52, 18)]
        for k in range(3):
            (cy, cx), r = centers[k], rng.randint(4, 8)
            m = make_blob(h, w, cy, cx, r)
            rle = R.encode(m)
            bb = R.toBbox(rle)
            annotations.append(
                dict(
                    id=aid,
                    image_id=img_id,
                    category_id=(k % 5) + 1,
                    bbox=bb.tolist(),
                    area=int(R.area(rle)),
                    segmentation=dict(size=rle["size"], counts=rle["counts"].decode()),
                    iscrowd=0,
                )
            )
            inst.append((rle, k % 5))
            aid += 1
        gt[img_id] = inst
    categories = [dict(id=i + 1, name=n) for i, n in enumerate(
        ("Neoplastic", "Inflammatory", "Connective", "Dead", "Epithelial"))]
    ann = dict(images=images, annotations=annotations, categories=categories)
    ann_path = d / "ann.json"
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return str(ann_path), str(img_dir), gt


def test_dataset_loading(tiny_coco):
    from nuhtc_tpu.data import PanNukeCocoDataset

    ann_path, img_dir, gt = tiny_coco
    ds = PanNukeCocoDataset(ann_path, img_prefix=img_dir, test_mode=True)
    assert len(ds) == 3
    info = ds.get_ann_info(0)
    assert info["bboxes"].shape == (3, 4)
    assert len(info["masks"]) == 3
    img = ds.load_image(0)
    assert img.shape == (64, 64, 3)
    ci = ds.build_class_index()
    assert all(len(v) for v in ci.values())


def test_evaluate_perfect_predictions(tiny_coco):
    from nuhtc_tpu.data import PanNukeCocoDataset

    ann_path, img_dir, gt = tiny_coco
    ds = PanNukeCocoDataset(ann_path, img_prefix=img_dir, test_mode=True)
    results = []
    for idx in range(len(ds)):
        ann = ds.get_ann_info(idx)
        bboxes = [np.zeros((0, 5), np.float32) for _ in range(5)]
        segms = [[] for _ in range(5)]
        for rle, lab, bb in zip(ann["masks"], ann["labels"], ann["bboxes"]):
            arr = np.concatenate([bb, [0.99]]).astype(np.float32)[None]
            bboxes[lab] = np.concatenate([bboxes[lab], arr])
            segms[lab].append(rle)
        results.append((bboxes, segms))
    metrics = evaluate_dataset(ds, results)
    assert metrics["pq"] == pytest.approx(1.0, abs=1e-3)
    assert metrics["aji"] == pytest.approx(1.0, abs=1e-3)
    # classes 0-2 are present in the fixture; absent classes score 0 (reference
    # behavior: nansum of all-NaN per-class rows → tp=fp=fn=0 → pq+ 0)
    for c in range(3):
        assert metrics[f"multi_pq+_{c}"] == pytest.approx(1.0, abs=1e-3)
    assert metrics["precision"] == pytest.approx(1.0, abs=1e-6)


def test_evaluate_empty_predictions(tiny_coco):
    from nuhtc_tpu.data import PanNukeCocoDataset

    ann_path, img_dir, gt = tiny_coco
    ds = PanNukeCocoDataset(ann_path, img_prefix=img_dir, test_mode=True)
    results = [
        ([np.zeros((0, 5), np.float32)] * 5, [[] for _ in range(5)]) for _ in range(len(ds))
    ]
    metrics = evaluate_dataset(ds, results)
    assert metrics["pq"] == 0.0
    assert metrics["recall"] == 0.0


def test_mask_nms_suppresses_duplicates():
    m1 = make_blob(32, 32, 10, 10, 6)
    m2 = make_blob(32, 32, 10, 11, 6)  # heavy overlap
    m3 = make_blob(32, 32, 25, 25, 4)
    rles = [R.encode(m) for m in (m1, m2, m3)]
    kept, idx = mask_nms(rles, np.array([0.9, 0.8, 0.7]), thr=0.05)
    assert len(kept) == 2
    assert list(idx) == [0, 2]


def test_convert_format_pannuke(tiny_coco):
    m1 = make_blob(64, 64, 10, 10, 5)
    m2 = make_blob(64, 64, 40, 40, 5)
    rles = [R.encode(m) for m in (m1, m2)]
    labels = np.array([0, 2])
    out = convert_format(rles, labels, 64, 64, 5, "pannuke")
    assert out.shape == (64, 64, 6)
    assert out[10, 10, 0] == 1 and out[40, 40, 2] == 1
    assert out[0, 0, 5] == 1  # background channel
    out2 = convert_format(rles, labels, 64, 64, 5, "conic")
    assert out2.shape == (64, 64, 2)
    assert out2[10, 10, 0] == 1 and out2[40, 40, 0] == 2
    assert out2[40, 40, 1] == 3  # label + 1


def test_evaluate_format_only(tiny_coco, tmp_path):
    """--format-only writes converted predictions (and the aggregate npy)
    without computing metrics (reference tools/test.py --format-only)."""
    from nuhtc_tpu.data import PanNukeCocoDataset

    ann_path, img_dir, gt = tiny_coco
    ds = PanNukeCocoDataset(ann_path, img_prefix=img_dir, test_mode=True)
    results = []
    for idx in range(len(ds)):
        ann = ds.get_ann_info(idx)
        bboxes = [np.zeros((0, 5), np.float32) for _ in range(5)]
        segms = [[] for _ in range(5)]
        for rle, lab, bb in zip(ann["masks"], ann["labels"], ann["bboxes"]):
            arr = np.concatenate([bb, [0.99]]).astype(np.float32)[None]
            bboxes[lab] = np.concatenate([bboxes[lab], arr])
            segms[lab].append(rle)
        results.append((bboxes, segms))
    out = str(tmp_path / "fmt")
    metrics = evaluate_dataset(
        ds, results, save=True, save_path=out, data_format="pannuke",
        format_only=True,
    )
    assert metrics == {}
    pred_dir = os.path.join(out, "PanNukeCocoDataset")
    per_img = [f for f in os.listdir(pred_dir) if f.startswith("im")]
    assert len(per_img) == 3
    agg = np.load(os.path.join(pred_dir, "preds_pannuke.npy"))
    assert agg.shape[0] == 3
