# Tiny-model synthetic-PanNuke config for the end-to-end regression golden
# (tools/misc/run_e2e_golden.py / tests/test_e2e_regression.py).
#
# Inherits the full PanNuke recipe (same layer stack, heads, losses, metric
# plumbing) and shrinks only the model dims + proposal budgets so the whole
# train -> checkpoint -> test -> compute_stats -> WSI chain runs on one CPU
# core in minutes. Data roots come from $NUHTC_SYN_ROOT so the chain can run
# out of a temp dir.

import os

_base_ = "./htc_lite_swin_fpn_pannuke.py"

_root = os.environ.get("NUHTC_SYN_ROOT", "./work_dirs/pannuke_syn")

scale_factor = 1.0  # keep 256px tiles at 256 through the tiny network
max_epochs = 1
samples_per_gpu = 2
checkpoint_interval = 1
evaluation = dict(interval=10, metric=["segm"])  # >max_epochs: tools/test.py covers eval

model = dict(
    backbone=dict(
        embed_dims=32,
        depths=[1, 1, 1, 1],
        num_heads=[1, 2, 4, 8],
        drop_path_rate=0.0,
        frozen_stages=-1,
    ),
    neck=dict(in_channels=[32, 64, 128, 256], out_channels=32),
    train_cfg=dict(
        rpn=dict(sampler=dict(num=256, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=512, max_per_img=256, nms_iou=0.7, min_bbox_size=4),
        rcnn=[
            dict(assigner_iou=t, sampler=dict(num=256, pos_fraction=0.25), mask_size=28)
            for t in (0.5, 0.6, 0.7)
        ],
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=512, max_per_img=256, nms=dict(iou_threshold=0.7), min_bbox_size=4),
        # random-ish weights: a low score_thr keeps the detection set
        # non-empty so the golden pins non-trivial behavior
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=64,
                  mask_thr_binary=0.5),
    ),
)

data = dict(
    samples_per_gpu=2,
    train=dict(
        type="CASDataset",
        dataset=dict(
            ann_file=f"{_root}/coco/PanNuke/PanNuke_annt_RLE_fold1.json",
            img_prefix=f"{_root}/datasets/PanNuke/rgb/",
            seg_prefix=f"{_root}/datasets/PanNuke/rgb_seg",
        ),
    ),
    test=dict(
        ann_file=f"{_root}/coco/PanNuke/PanNuke_annt_RLE_fold3.json",
        img_prefix=f"{_root}/datasets/PanNuke/rgb/",
        seg_prefix=f"{_root}/datasets/PanNuke/rgb_seg",
    ),
)

# compact pipeline: keep the photometric + geometric + normalize chain but
# stay at the 256 tile scale (the x2 Resize is the production recipe; unit
# tests cover every transform individually)
train_pipeline = [
    dict(type="PhotoMetricDistortion", brightness_delta=32, contrast_range=(0.5, 1.5),
         saturation_range=(0.5, 1.5), hue_delta=9),
    dict(type="Resize", img_scale=(256, 256), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5, direction=["horizontal", "vertical", "diagonal"]),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
         to_rgb=True),
    dict(type="Pad", size_divisor=32),
    dict(type="SegRescale", scale_factor=0.25),
]
