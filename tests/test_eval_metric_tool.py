"""tools/analysis_tools/eval_metric.py: re-score pickled results without
inference (reference eval_metric.py:47-76). Perfect predictions pickled in
tools/test.py's --out format must evaluate to PQ≈1 through the CLI."""

import importlib.util
import json
import os
import pickle
import sys

import numpy as np
import pytest

from nuhtc_tpu.ops import rle as R

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(TOOLS, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


@pytest.fixture(scope="module")
def coco_cfg_pkl(tmp_path_factory):
    d = tmp_path_factory.mktemp("evalmetric")
    img_dir = d / "imgs"
    img_dir.mkdir()
    import cv2

    h = w = 64
    images, annotations = [], []
    aid = 1
    per_img = []
    for img_id in range(2):
        rng = np.random.RandomState(img_id)
        cv2.imwrite(str(img_dir / f"im{img_id}.png"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append(dict(id=img_id, file_name=f"im{img_id}.png", height=h, width=w))
        bboxes = [np.zeros((0, 5), np.float32) for _ in range(5)]
        segms = [[] for _ in range(5)]
        for k, (cy, cx) in enumerate([(14, 14), (40, 44)]):
            m = _blob(h, w, cy, cx, 6)
            rle = R.encode(m)
            bb = R.toBbox(rle)
            annotations.append(dict(
                id=aid, image_id=img_id, category_id=k + 1, bbox=bb.tolist(),
                area=int(R.area(rle)),
                segmentation=dict(size=rle["size"], counts=rle["counts"].decode()),
                iscrowd=0))
            aid += 1
            bboxes[k] = np.concatenate([bb, [0.95]]).astype(np.float32)[None]
            segms[k].append(rle)
        per_img.append((bboxes, segms))
    cats = [dict(id=i + 1, name=n) for i, n in enumerate(
        ("Neoplastic", "Inflammatory", "Connective", "Dead", "Epithelial"))]
    ann_path = d / "ann.json"
    with open(ann_path, "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)

    pkl_path = d / "results.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(per_img, f)

    cfg_path = d / "cfg.py"
    cfg_path.write_text(
        "data = dict(test=dict(type='PanNukeCocoDataset', "
        f"ann_file={str(ann_path)!r}, img_prefix={str(img_dir)!r}))\n"
    )
    return str(cfg_path), str(pkl_path)


def test_eval_metric_perfect(coco_cfg_pkl, capsys, monkeypatch):
    cfg_path, pkl_path = coco_cfg_pkl
    mod = _load("eval_metric.py", "eval_metric_tool")
    monkeypatch.setattr(sys, "argv",
                        ["eval_metric.py", cfg_path, pkl_path, "--eval", "segm"])
    mod.main()
    out = capsys.readouterr().out
    pq = {l.split(":")[0]: float(l.split(":")[1]) for l in out.strip().splitlines()
          if ":" in l and l.split(":")[0] == "pq"}
    assert pq["pq"] == pytest.approx(1.0, abs=1e-3)


def test_eval_metric_requires_mode(coco_cfg_pkl, monkeypatch):
    cfg_path, pkl_path = coco_cfg_pkl
    mod = _load("eval_metric.py", "eval_metric_tool2")
    monkeypatch.setattr(sys, "argv", ["eval_metric.py", cfg_path, pkl_path])
    with pytest.raises(SystemExit):
        mod.main()
