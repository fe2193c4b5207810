"""Per-dataset config fidelity vs the reference recipes.

The spec is the diff between each reference config and the PanNuke one
(configs/nuhtc/htc_lite_swin_pytorch_fpn_{CoNIC,CoNSeP,NuCLS}_seasaw_CAS.py):
every reference-divergent hyperparameter must resolve to the reference value
through this framework's config system (_base_ inheritance + deep merge).
Also covers the crop transforms those configs introduce (RandomCrop /
CusRandomCrop / FOVCrop, reference resize_scale.py).
"""

import numpy as np
import pytest

from nuhtc_tpu.config.config import Config
from nuhtc_tpu.data.pipelines import (
    CusRandomCrop,
    FOVCrop,
    RandomCrop,
    run_pipeline,
)

CFG_DIR = "configs/nuhtc"


def _load(name):
    return Config.fromfile(f"{CFG_DIR}/{name}")


@pytest.fixture(scope="module")
def cfgs():
    return {
        "pannuke": _load("htc_lite_swin_fpn_pannuke.py"),
        "conic": _load("htc_lite_swin_fpn_conic.py"),
        "consep": _load("htc_lite_swin_fpn_consep.py"),
        "nucls": _load("htc_lite_swin_fpn_nucls.py"),
    }


def _pipeline_types(cfg):
    return [t["type"] for t in cfg["train_pipeline"]]


def test_pannuke_reference_values(cfgs):
    cfg = cfgs["pannuke"]
    assert cfg["num_classes"] == 5
    assert cfg["scale_factor"] == 2.0
    assert cfg["max_epochs"] == 200
    assert cfg.model["test_cfg"]["rcnn"]["max_per_img"] == 500
    assert cfg["lr_config"]["step"] == [30, 160]
    assert "RandomCrop" not in _pipeline_types(cfg)  # commented out in ref :272


def test_conic_reference_values(cfgs):
    # ref htc_lite_swin_pytorch_fpn_CoNIC_seasaw_CAS.py:6-7,265,272
    cfg = cfgs["conic"]
    assert cfg["num_classes"] == 6
    assert cfg["scale_factor"] == 4.0
    assert cfg.model["test_cfg"]["rcnn"]["max_per_img"] == 300
    types = _pipeline_types(cfg)
    assert types[0] == "RandomCrop"
    crop = cfg["train_pipeline"][0]
    assert tuple(crop["crop_size"]) == (128, 128)
    # inherited PanNuke values stay put
    assert cfg["max_epochs"] == 200
    assert cfg["lr_config"]["step"] == [30, 160]
    assert cfg.model["roi_head"]["bbox_head"][0]["num_classes"] == 6


def test_consep_reference_values(cfgs):
    # ref htc_lite_swin_pytorch_fpn_CoNSeP_seasaw_CAS.py:4,6,206-238,262,376-378
    cfg = cfgs["consep"]
    assert cfg["num_classes"] == 4
    assert cfg["max_epochs"] == 100
    assert cfg.model["test_cfg"]["rcnn"]["max_per_img"] == 300
    assert cfg["lr_config"]["step"] == [30, 80]
    assert cfg["checkpoint_config"]["max_keep_ckpts"] == 20
    for stage in cfg.model["train_cfg"]["rcnn"]:
        assert stage["assigner"]["type"] == "MaxIoUAssigner"
    # watershed stays ON: the ref config drops the kwarg but the Lite head
    # default is True (htc_roi_head_cus.py:1891)
    assert cfg.model["roi_head"].get("watershed_proposal", True) is True
    assert cfg["scale_factor"] == 2.0  # inherited


def test_nucls_reference_values(cfgs):
    # ref htc_lite_swin_pytorch_fpn_NuCLS_seasaw_CAS.py
    cfg = cfgs["nucls"]
    assert cfg["num_classes"] == 8
    assert cfg["max_epochs"] == 100
    assert cfg.model["roi_head"]["type"] == "HybridTaskCascadeRoIHead_Lite_Partial"
    assert cfg.model["roi_head"]["semantic_head"]["loss_seg"]["type"] == "PartialDiceLoss"
    # merged, not replaced: base semantic_head fields survive
    assert cfg.model["roi_head"]["semantic_head"]["num_convs"] == 4
    assert cfg.model["test_cfg"]["rcnn"]["max_per_img"] == 300
    for stage in cfg.model["train_cfg"]["rcnn"]:
        assert stage["assigner"]["type"] == "MaxIoUAssigner"
    types = _pipeline_types(cfg)
    assert types[:2] == ["FOVCrop", "CusRandomCrop"]
    assert tuple(cfg["train_pipeline"][1]["crop_size"]) == (256, 256)
    # geometric OneOf keeps only the 3 translate variants (ref :290-304)
    seq = [t for t in cfg["train_pipeline"] if t["type"] == "Sequential"][0]
    oneof = seq["transforms"][0]
    inner = [t["type"] for t in oneof["transforms"]]
    assert inner == ["RandTranslate"] * 3
    assert cfg["samples_per_gpu"] == 4
    assert cfg["evaluation"]["interval"] == 1
    assert cfg["evaluation"]["crop_inference_to_fov"] is False
    assert cfg["checkpoint_config"]["interval"] == 2
    assert cfg["checkpoint_config"]["max_keep_ckpts"] == 100
    assert cfg["ema"]["momentum"] == 0.001
    assert cfg["lr_config"]["step"] == [30, 80]


def test_build_detector_honors_divergences(cfgs):
    from nuhtc_tpu.models.build import build_detector

    for name, max_per_img, sf in (
        ("conic", 300, 4.0),
        ("consep", 300, 2.0),
        ("nucls", 300, 2.0),
    ):
        cfg = cfgs[name]
        m = build_detector(
            cfg.model, cfg.model.get("test_cfg"), float(cfg["scale_factor"])
        )
        assert m.rcnn_max_per_img == max_per_img, name
        assert m.scale_factor == sf, name
        assert m.lite is True, name


# --------------------------------------------------------------------------- #
# crop transforms (reference resize_scale.py RandomCrop/CusRandomCrop/FOVCrop)
# --------------------------------------------------------------------------- #
def _sample(n=3, hw=64):
    rng = np.random.RandomState(0)
    img = rng.rand(hw, hw, 3).astype(np.float32) * 255
    boxes = np.array(
        [[2, 2, 12, 12], [40, 40, 60, 60], [30, 5, 45, 20]][:n], np.float32
    )
    masks = np.zeros((n, hw, hw), np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        masks[i, y1:y2, x1:x2] = 1
    return dict(
        img=img,
        gt_bboxes=boxes.copy(),
        gt_labels=np.arange(n, dtype=np.int64),
        gt_masks=masks,
        gt_semantic_seg=(masks.sum(0) > 0).astype(np.uint8),
        ismask=np.ones(n, np.float32),
    )


def test_random_crop_filters_and_aligns():
    res = _sample()
    rng = np.random.RandomState(3)
    out = None
    while out is None:  # negative crops are allowed to reject; retry
        out = RandomCrop(crop_size=(32, 32))(_sample(), rng)
    n = len(out["gt_bboxes"])
    assert n >= 1
    assert len(out["gt_labels"]) == n
    assert len(out["ismask"]) == n
    assert len(out["gt_masks"]) == n
    assert out["img"].shape[:2] == (32, 32)
    assert out["gt_semantic_seg"].shape == (32, 32)
    assert out["gt_masks"].shape[1:] == (32, 32)
    # boxes clip to crop frame
    assert out["gt_bboxes"].min() >= 0
    assert out["gt_bboxes"][:, 0::2].max() <= 32
    assert (out["gt_bboxes"][:, 2] > out["gt_bboxes"][:, 0]).all()
    # surviving labels come from the original set (no reindex corruption)
    assert set(out["gt_labels"]).issubset({0, 1, 2})


def test_random_crop_negative_returns_none():
    res = _sample(n=1)  # single box at (2,2)-(12,12)
    res["gt_bboxes"] = np.array([[2, 2, 12, 12]], np.float32)

    class FixedRng:
        def randint(self, lo, hi=None):
            return (hi if hi is not None else lo) - 1  # bottom-right corner

    out = RandomCrop(crop_size=(16, 16))(res, FixedRng())
    assert out is None
    # allow_negative_crop keeps the (gt-less) crop
    res = _sample(n=1)
    out = RandomCrop(crop_size=(16, 16), allow_negative_crop=True)(res, FixedRng())
    assert out is not None and len(out["gt_bboxes"]) == 0


def test_cus_random_crop_partial_prefix_invariant():
    # NuCLS partial state: 2 masked + 1 box-only instance; a crop must keep
    # masked instances ahead of box-only ones
    rng = np.random.RandomState(0)
    out = None
    while out is None:
        res = _sample(n=3)
        res["gt_masks"] = res["gt_masks"][:2]  # box-only tail
        res["ismask"] = np.array([1.0, 1.0, 0.0], np.float32)
        out = CusRandomCrop(crop_size=(48, 48))(res, rng)
    assert len(out["gt_masks"]) <= len(out["gt_bboxes"])
    assert len(out["ismask"]) == len(out["gt_bboxes"])


def test_fovcrop_uses_fovloc():
    res = _sample()
    res["img_info"] = {"fovloc": [10, 5, 50, 45]}  # x1 y1 x2 y2
    out = FOVCrop(allow_negative_crop="True")(res, None)
    assert out["img"].shape[:2] == (40, 40)
    # first box (2,2,12,12) clips into the fov frame
    assert out["gt_bboxes"][:, 0::2].max() <= 40
    # without fovloc: pass-through
    res = _sample()
    out = FOVCrop()(res, None)
    assert out["img"].shape[:2] == (64, 64)


def test_run_pipeline_propagates_none():
    class Reject:
        def __call__(self, results, rng):
            return None

    assert run_pipeline([Reject()], _sample(), np.random.RandomState(0)) is None
