# NuHTC-TPU PanNuke config — same hyperparameters as the reference recipe
# (boyden/NuHTC configs/nuhtc/htc_lite_swin_pytorch_fpn_PanNuke_seasaw_CAS.py),
# expressed in this framework's compact schema.

fold = 1
num_classes = 5
scale_factor = 2.0  # 256px tiles are rescaled x2 through the network
max_epochs = 200
dataset_name = "PanNuke"
dataset = f"{dataset_name}CocoDataset"
data_dir = "./datasets"
basedir = f"{data_dir}/{dataset_name}"
work_dir = "./work_dirs/${log_name}"
log_name = f"nuhtc_tpu_pannuke_fold{fold}"
seg_ignore_label = 0
attn_thres = 0.965926

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)

model = dict(
    type="NuHTC",
    backbone=dict(
        type="SwinTransformer",
        embed_dims=96,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        window_size=7,
        mlp_ratio=4,
        qkv_bias=True,
        drop_path_rate=0.2,
        patch_norm=True,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
    ),
    neck=dict(type="FPN", in_channels=[96, 192, 384, 768], out_channels=64, num_outs=4),
    rpn_head=dict(
        type="RPNHead",
        in_channels=64,
        feat_channels=64,
        anchor_generator=dict(scales=[4], ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32]),
    ),
    roi_head=dict(
        type="HybridTaskCascadeRoIHead_Lite",
        num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        watershed_proposal=True,
        interleaved=True,
        mask_info_flow=True,
        bbox_roi_extractor=dict(
            type="AttentionRoIExtractor",
            start_level=2,
            thres=attn_thres,
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=2),
            out_channels=64,
            featmap_strides=[4, 8, 16, 32],
        ),
        bbox_head=[
            dict(
                type="Shared2FCBBoxHeadWithProb",
                in_channels=64,
                fc_out_channels=256,
                roi_feat_size=7,
                num_classes=num_classes,
                reg_class_agnostic=True,
                cls_predictor_cfg=dict(type="NormedLinear", tempearture=20),
                bbox_coder=dict(target_stds=s),
                loss_cls=dict(type="SeesawLoss", p=0.8, q=2.0, num_classes=num_classes),
                loss_bbox=dict(type="SmoothL1Loss", beta=1.0),
            )
            for s in ([0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1], [0.033, 0.033, 0.067, 0.067])
        ],
        mask_roi_extractor=dict(
            type="AttentionRoIExtractor",
            start_level=2,
            thres=attn_thres,
            roi_layer=dict(type="RoIAlign", output_size=14, sampling_ratio=0),
            out_channels=64,
            featmap_strides=[4, 8, 16, 32],
        ),
        mask_head=[
            dict(
                type="HTCMaskHead",
                with_conv_res=True,
                num_convs=4,
                in_channels=64,
                conv_out_channels=64,
                class_agnostic=True,
                num_classes=num_classes,
                loss_mask=dict(type="DiceLoss", loss_weight=1.0),
            )
        ],
        semantic_head=dict(
            type="FusedSemanticHead",
            num_ins=4,
            fusion_level=0,
            num_convs=4,
            in_channels=64,
            conv_out_channels=64,
            num_classes=1,
            loss_seg=dict(type="DiceLoss", loss_weight=1.0),
        ),
    ),
    train_cfg=dict(
        rpn=dict(
            assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3),
            sampler=dict(num=1024, pos_fraction=0.5),
        ),
        rpn_proposal=dict(nms_pre=6000, max_per_img=3000, nms_iou=0.7, min_bbox_size=10),
        rcnn=[
            dict(assigner_iou=t, sampler=dict(num=1024, pos_fraction=0.25), mask_size=28)
            for t in (0.5, 0.6, 0.7)
        ],
    ),
    test_cfg=dict(
        rpn=dict(
            nms_pre=3000,
            max_per_img=1000,
            nms=dict(iou_threshold=0.7),
            min_bbox_size=10,
        ),
        rcnn=dict(
            score_thr=0.35,
            nms=dict(iou_threshold=0.5),
            max_per_img=500,
            mask_thr_binary=0.5,
        ),
    ),
)

# -- training recipe ---------------------------------------------------------
optimizer = dict(
    type="AdamW",
    lr=1e-4,
    betas=(0.9, 0.999),
    weight_decay=0.05,
    no_decay_keys=["absolute_pos_embed", "relative_position_bias_table", "norm"],
)
lr_config = dict(policy="step", warmup_iters=1000, warmup_ratio=1e-3, step=[30, 160])
ema = dict(momentum=2e-4)
finetune_iter = 15000  # unfreeze frozen backbone stages at this step
samples_per_gpu = 8
checkpoint_interval = 10
evaluation = dict(interval=10, metric=["bbox", "segm"])

data = dict(
    samples_per_gpu=samples_per_gpu,
    train=dict(
        type="CASDataset",
        dataset=dict(
            type=dataset,
            ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_fold{(fold - 1) % 3 + 1}.json",
            img_prefix=f"{basedir}/rgb/",
            seg_prefix=f"{basedir}/rgb_seg",
        ),
    ),
    test=dict(
        type=dataset,
        ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_fold{(fold + 4) % 3 + 1}.json",
        img_prefix=f"{basedir}/rgb/",
        seg_prefix=f"{basedir}/rgb_seg",
    ),
)

train_pipeline = [
    dict(type="PhotoMetricDistortion", brightness_delta=32, contrast_range=(0.5, 1.5),
         saturation_range=(0.5, 1.5), hue_delta=9),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5, direction=["horizontal", "vertical", "diagonal"]),
    dict(type="RandCorrupt", prob=0.5),
    dict(
        type="Sequential",
        transforms=[
            dict(
                type="OneOf",
                transforms=[
                    dict(type="RandTranslate", x=(-0.1, 0.1), seg_ignore_label=seg_ignore_label),
                    dict(type="RandTranslate", y=(-0.1, 0.1), seg_ignore_label=seg_ignore_label),
                    dict(type="RandTranslate", x=(-0.1, 0.1), y=(-0.1, 0.1),
                         seg_ignore_label=seg_ignore_label),
                    dict(type="RandRotate", angle=(-10, 10), seg_ignore_label=seg_ignore_label),
                    [
                        dict(type="RandShear", x=(-10, 10), seg_ignore_label=seg_ignore_label),
                        dict(type="RandShear", y=(-10, 10), seg_ignore_label=seg_ignore_label),
                    ],
                ],
            ),
            dict(type="RecomputeBox"),
        ],
    ),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="SegRescale", scale_factor=0.25),
]
