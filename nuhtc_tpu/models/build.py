"""Translate reference-style model config dicts into NuHTC modules.

The reference defines models entirely through mmdet config dicts
(configs/nuhtc/htc_lite_swin_pytorch_fpn_PanNuke_seasaw_CAS.py:29-267). We
accept the same schema so configs port over unchanged, and map it onto the
TPU-native module tree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from nuhtc_tpu.models.detector import NuHTC


def build_detector(model_cfg: Dict[str, Any], test_cfg: Dict[str, Any] | None = None,
                   scale_factor: float = 2.0, dtype=jnp.float32):
    """model_cfg: the reference ``model=dict(...)`` tree (or a Config slice).

    ``type`` dispatches through the DETECTORS registry: the HTC config schema
    maps onto NuHTC below; other detector classes (e.g. the standalone
    MaskRCNN family) take their config keys as direct constructor kwargs."""
    model_cfg = dict(model_cfg)
    mtype = model_cfg.get("type")
    if mtype and mtype not in ("NuHTC", "HybridTaskCascade_Cus"):
        import dataclasses

        from nuhtc_tpu.registry import DETECTORS

        cls = DETECTORS.get(mtype)
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in model_cfg.items() if k in fields}
        # Reference-style nested test_cfg (rcnn score/nms/max_per_img) maps
        # onto the flat dataclass fields so registry detectors honor it too.
        tc = dict(test_cfg or model_cfg.get("test_cfg") or {})
        rcnn_tc = dict(tc.get("rcnn") or {})
        rcnn_nms = dict(rcnn_tc.get("nms") or {})
        for field, val in (
            ("rcnn_score_thr", rcnn_tc.get("score_thr")),
            ("rcnn_nms_iou", rcnn_nms.get("iou_threshold")),
            ("rcnn_max_per_img", rcnn_tc.get("max_per_img")),
            ("mask_thr_binary", rcnn_tc.get("mask_thr_binary")),
        ):
            if field in fields and val is not None:
                kwargs.setdefault(field, val)
        kwargs.setdefault("scale_factor", scale_factor)
        kwargs.setdefault("dtype", dtype)
        dropped = set(model_cfg) - set(kwargs) - {"type", "test_cfg"}
        if dropped:
            import logging

            logging.getLogger("nuhtc_tpu").warning(
                "build_detector %s: ignoring config keys %s", mtype, sorted(dropped)
            )
        return cls(**kwargs)
    test_cfg = dict(test_cfg or model_cfg.get("test_cfg") or {})
    roi = dict(model_cfg.get("roi_head") or {})
    neck = dict(model_cfg.get("neck") or {})
    backbone = dict(model_cfg.get("backbone") or {})
    backbone.pop("type", None)
    backbone.pop("init_cfg", None)
    for k in ("depths", "num_heads", "out_indices"):
        if k in backbone:
            backbone[k] = tuple(backbone[k])

    bbox_heads = roi.get("bbox_head") or [{}]
    if isinstance(bbox_heads, dict):
        bbox_heads = [bbox_heads]
    num_classes = bbox_heads[0].get("num_classes", 5)

    bbox_ext = dict(roi.get("bbox_roi_extractor") or {})
    attn_thres = bbox_ext.get("thres", 0.965926)
    start_level = bbox_ext.get("start_level", 2)
    strides = tuple(bbox_ext.get("featmap_strides", (4, 8, 16, 32)))

    rpn_test = dict(test_cfg.get("rpn") or {})
    rcnn_test = dict(test_cfg.get("rcnn") or {})
    rpn_nms = dict(rpn_test.get("nms") or {})
    rcnn_nms = dict(rcnn_test.get("nms") or {})

    # RoI-head family dispatch (reference htc_roi_head_cus.py classes):
    # *_Lite* → final-stage mask head only; *_Lite_Fuse adds the n-class seg
    # branch; the plain _Cus head runs a mask head at every cascade stage
    # with info-flow. An explicit roi_head.lite/lite_fuse key overrides.
    roi_type = str(roi.get("type", "HybridTaskCascadeRoIHead_Lite"))
    lite = bool(roi.get("lite", "Lite" in roi_type))
    lite_fuse = bool(roi.get("lite_fuse", "Fuse" in roi_type))

    # train_cfg.rcnn[*].sampler.type selects the cascade RoI sampler
    # (reference nuhtc/datasets/samplers/: RandomSampler default,
    # OHEMSampler_HTC, InstanceBalancedPosSampler_Cus)
    rcnn_train = dict(model_cfg.get("train_cfg") or {}).get("rcnn") or []
    if isinstance(rcnn_train, dict):
        rcnn_train = [rcnn_train]
    sampler_type = ""
    for st in rcnn_train:
        sampler_type = ((st or {}).get("sampler") or {}).get("type") or sampler_type
    rcnn_sampler = (
        "ohem" if "OHEM" in sampler_type
        else "instance_balanced" if "InstanceBalanced" in sampler_type
        else "random"
    )

    return NuHTC(
        num_classes=num_classes,
        fpn_channels=neck.get("out_channels", 64),
        strides=strides,
        num_stages=roi.get("num_stages", 3),
        lite=lite,
        lite_fuse=lite_fuse,
        rcnn_sampler=rcnn_sampler,
        attn_start_level=start_level,
        attn_thres=attn_thres,
        rpn_nms_pre=rpn_test.get("nms_pre", 3000),
        rpn_max_per_img=rpn_test.get("max_per_img", 1000),
        rpn_nms_iou=rpn_nms.get("iou_threshold", 0.7),
        rpn_min_bbox_size=rpn_test.get("min_bbox_size", 10.0),
        rcnn_score_thr=rcnn_test.get("score_thr", 0.35),
        rcnn_nms_iou=rcnn_nms.get("iou_threshold", 0.5),
        rcnn_max_per_img=rcnn_test.get("max_per_img", 500),
        mask_thr_binary=rcnn_test.get("mask_thr_binary", 0.5),
        watershed_proposal=roi.get("watershed_proposal", True),
        scale_factor=scale_factor,
        backbone_cfg=backbone,
        dtype=dtype,
    )
