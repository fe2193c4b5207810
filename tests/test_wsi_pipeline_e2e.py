"""End-to-end WSI stage-B test with a tiny detector on a synthetic slide."""

import json
import os

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_engine():
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.apis.inference import InferenceEngine
    from nuhtc_tpu.models.detector import NuHTC

    model = NuHTC(
        num_classes=5,
        fpn_channels=32,
        backbone_cfg=dict(embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=128,
        rpn_max_per_img=64,
        rpn_min_bbox_size=0.0,
        rcnn_max_per_img=32,
        rcnn_score_thr=0.05,
        watershed_max=32,
        nms_candidates=128,
        scale_factor=1.0,  # keep tiles at 64 to stay fast on CPU
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")
    return InferenceEngine(model, params, batch_size=2, tile_size=64, scale_factor=1.0)


def test_wsi_stage_b(tiny_engine, tmp_path):
    from nuhtc_tpu.wsi.slide import open_slide
    from nuhtc_tpu.wsi.infer import infer_slide

    img = np.full((256, 256, 3), 240, np.uint8)
    cv2.circle(img, (128, 128), 90, (190, 120, 160), -1)
    spath = str(tmp_path / "s.png")
    cv2.imwrite(spath, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    slide = open_slide(spath)
    coords = np.array([[0, 0], [64, 64], [128, 128], [64, 128]], np.int64)

    out_dir = str(tmp_path / "nuclei")
    stats = infer_slide(
        tiny_engine, slide, coords, out_dir, "s",
        classes=("A", "B", "C", "D", "E"), patch_size=64, mode="all", progress=False,
    )
    assert stats["tiles"] == 4
    # all export artifacts exist
    assert os.path.exists(os.path.join(out_dir, "s.geojson"))
    assert os.path.exists(os.path.join(out_dir, "s_point.geojson"))
    assert os.path.exists(os.path.join(out_dir, "s_dsa.json"))
    assert os.path.exists(os.path.join(out_dir, "coco_nuclei.json"))
    assert os.path.exists(os.path.join(out_dir, "s_dql.db"))
    with open(os.path.join(out_dir, "s.geojson")) as f:
        feats = json.load(f)
    # schema check (QuPath format) — detections may be empty with random weights
    for ft in feats:
        assert ft["type"] == "Feature"
        assert ft["geometry"]["type"] == "Polygon"
        assert "classification" in ft["properties"]
    # sqlite rtree exists
    import sqlite3

    conn = sqlite3.connect(os.path.join(out_dir, "s_dql.db"))
    tables = {r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type IN ('table','view')")}
    assert "contour" in tables
    conn.close()


def test_tta_engine(tiny_engine):
    from nuhtc_tpu.apis.inference import TTAEngine

    rng = np.random.RandomState(0)
    imgs = [(rng.rand(64, 64, 3) * 255).astype(np.uint8)]
    tta = TTAEngine(tiny_engine, flips=("none", "horizontal"))
    out = tta.run_batch(imgs)
    assert len(out) == 1
    assert "boxes" in out[0] and "masks" in out[0]


def test_tta_box_nms_dedups_without_masks():
    """paste_masks=False: the merge must still dedup (box-IoU NMS) — every
    instance otherwise appears once per flip (round-2 advisor finding)."""
    from nuhtc_tpu.apis.inference import TTAEngine, _box_nms

    class _FakeEngine:
        def run_batch(self, imgs):
            out = []
            for im in imgs:
                h, w = im.shape[:2]
                boxes = np.array([[10.0, 10.0, 20.0, 20.0],
                                  [40.0, 8.0, 50.0, 18.0]], np.float32)
                if im[0, -1, 0] == 7:  # marker pixel moved → flipped view
                    boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
                out.append(dict(boxes=boxes,
                                scores=np.array([0.9, 0.8], np.float32),
                                labels=np.array([0, 1], np.int64)))
            return out

    img = np.zeros((64, 64, 3), np.uint8)
    img[0, 0, 0] = 7  # asymmetric so the fake engine can detect the flip
    tta = TTAEngine(_FakeEngine(), flips=("none", "horizontal"))
    out = tta.run_batch([img])[0]
    # both flips produce the same two instances in the original frame —
    # the merge keeps exactly two
    assert len(out["scores"]) == 2
    assert "masks" not in out

    # _box_nms keeps disjoint boxes and drops exact overlaps
    keep = _box_nms(np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                             np.float32),
                    np.array([0.5, 0.9, 0.7], np.float32), thr=0.5)
    assert sorted(keep.tolist()) == [1, 2]
