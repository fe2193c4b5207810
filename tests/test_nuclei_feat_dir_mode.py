"""Directory mode of tools/nuclei_feat_extract.py (reference
nuclei_feat_extract.py:28-113): slide iteration, min_num filter,
occlusion-flattened label map, resume/skip-if-done."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "nuclei_feat_extract.py")


def _load():
    spec = importlib.util.spec_from_file_location("nfe_tool", TOOL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["nfe_tool"] = mod
    spec.loader.exec_module(mod)
    return mod


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


@pytest.fixture()
def datadir(tmp_path):
    import cv2

    from nuhtc_tpu.ops import rle as R

    d = tmp_path / "wsi_out"
    slide = d / "slideA"
    patches = slide / "patches"
    patches.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    # img 0: 3 nuclei, one fully occluded by a later instance
    # img 1: only 1 nucleus (filtered out by min_num=2)
    specs = [
        [(20, 20, 6), (20, 20, 8), (44, 44, 6)],  # ann0 ⊂ ann1 → ann0 occluded
        [(30, 30, 6)],
    ]
    for iid, inst in enumerate(specs):
        img = (rng.rand(64, 64, 3) * 200 + 30).astype(np.uint8)
        cv2.imwrite(str(patches / f"{iid}.png"), img)
        images.append(dict(id=iid, file_name=f"patches/{iid}.png", height=64,
                           width=64, n_objects=len(inst)))
        for cy, cx, r in inst:
            m = _disk(64, 64, cy, cx, r)
            rle = R.encode(m)
            bb = R.toBbox(rle)
            annotations.append(dict(
                id=aid, image_id=iid, category_id=1, bbox=bb.tolist(),
                area=int(R.area(rle)), iscrowd=0, score=0.9,
                segmentation=dict(size=rle["size"], counts=rle["counts"].decode())))
            aid += 1
    cats = [dict(id=1, name="Neoplastic")]
    with open(slide / "coco_nuclei.json", "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    return str(d)


def test_dir_mode_features_and_occlusion(datadir, monkeypatch):
    import pandas as pd

    mod = _load()
    monkeypatch.setattr(sys, "argv",
                        ["t", datadir, "--min_num", "2", "--patch_size", "64"])
    mod.main()
    out = os.path.join(datadir, "nuclei_feat", "slideA", "nuclei_feat.csv")
    df = pd.read_csv(out, index_col=0)
    # img1 filtered by min_num; img0's ann 1 fully occluded by ann 2 → 2 rows
    assert set(df["img_id"]) == {0}
    assert len(df) == 2
    assert set(df["annotation_id"]) == {2, 3}
    assert (df["img_objs"] == 3).all()
    assert (df["cell_type"] == "Neoplastic").all()
    assert "area" in df.columns and (df["area"] > 0).all()

    # resume: done-set equality → skip without touching the csv
    mtime = os.path.getmtime(out)
    mod.main()
    assert os.path.getmtime(out) == mtime


def test_dir_mode_patch_size_resize(datadir, monkeypatch):
    import pandas as pd

    mod = _load()
    monkeypatch.setattr(sys, "argv",
                        ["t", datadir, "--min_num", "2", "--patch_size", "128"])
    mod.main()
    df = pd.read_csv(os.path.join(datadir, "nuclei_feat", "slideA",
                                  "nuclei_feat.csv"), index_col=0)
    # areas scale ~4x under the 64→128 resize (reference :71-73,86-87)
    assert len(df) == 2
    assert (df["area"] > 300).all()
