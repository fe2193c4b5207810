# NuCLS (8 classes, partial mask annotations) — faithful to the reference
# recipe (configs/nuhtc/htc_lite_swin_pytorch_fpn_NuCLS_seasaw_CAS.py).
# Divergences from PanNuke reproduced (diff vs the PanNuke config is the spec):
#   roi_head = HybridTaskCascadeRoIHead_Lite_Partial (ref :74 — partial-mask
#       supervision: box-only instances (ismask=0) contribute no mask loss and
#       their pixels are excluded from the semantic dice — the NuHTC detector
#       activates this whenever the batch carries gt_ismask)
#   semantic loss = PartialDiceLoss(use_sigmoid=True) (ref :182)
#   rcnn assigner = MaxIoUAssigner ×3 (ref :210-242 — behaviorally identical
#       to MaskIoUAssigner: assign() is called without precomputed overlaps)
#   rcnn max_per_img = 300 (ref :266)
#   max_epochs = 100 (ref :9); lr step = [30, 80] (ref :372)
#   train pipeline: FOVCrop(allow_negative_crop='True') + CusRandomCrop(256)
#       first (ref :273-274); geometric OneOf = 3 RandTranslate variants only
#       (no RandRotate/RandShear, ref :290-304); Collect meta carries ismask
#       (ref :315-318 — this framework's loader always threads ismask through)
#   samples_per_gpu = 4, workers 4 (ref :337-338)
#   evaluation interval = 1, crop_inference_to_fov=False (ref :360)
#   checkpoint interval = 2, max_keep_ckpts = 100 (ref :374)
#   EMA momentum = 0.001 (ref :395)
_base_ = "./htc_lite_swin_fpn_pannuke.py"

num_classes = 8
max_epochs = 100
dataset_name = "NuCLS"
dataset = f"{dataset_name}CocoDataset"
basedir = "./datasets/NuCLS"
log_name = "nuhtc_tpu_nucls"
partial_masks = True  # instances with ismask=0 contribute no mask loss
fold = 1
seg_ignore_label = 0

model = dict(
    roi_head=dict(
        type="HybridTaskCascadeRoIHead_Lite_Partial",
        bbox_head=[
            dict(num_classes=num_classes, loss_cls=dict(num_classes=num_classes))
            for _ in range(3)
        ],
        mask_head=[dict(num_classes=num_classes)],
        semantic_head=dict(
            loss_seg=dict(type="PartialDiceLoss", loss_weight=1.0, use_sigmoid=True)
        ),
    ),
    train_cfg=dict(
        rcnn=[
            dict(
                assigner=dict(type="MaxIoUAssigner", pos_iou_thr=t, neg_iou_thr=t,
                              min_pos_iou=t),
                assigner_iou=t,
                sampler=dict(num=1024, pos_fraction=0.25),
                mask_size=28,
            )
            for t in (0.5, 0.6, 0.7)
        ],
    ),
    test_cfg=dict(rcnn=dict(max_per_img=300)),
)

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)

# Full pipeline re-stated (list fields replace, not merge): FOVCrop +
# CusRandomCrop lead; the geometric OneOf keeps only the translate variants.
train_pipeline = [
    dict(type="FOVCrop", allow_negative_crop="True"),
    dict(type="CusRandomCrop", crop_size=(256, 256)),
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
                ],
            ),
            dict(type="RecomputeBox"),
        ],
    ),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="SegRescale", scale_factor=0.25),
]

samples_per_gpu = 4
lr_config = dict(policy="step", warmup_iters=1000, warmup_ratio=1e-3, step=[30, 80])
checkpoint_config = dict(interval=2, max_keep_ckpts=100)
evaluation = dict(interval=1, metric=["bbox", "segm", "proposal"],
                  crop_inference_to_fov=False)
ema = dict(momentum=0.001)

data = dict(
    samples_per_gpu=samples_per_gpu,
    train=dict(
        dataset=dict(
            type=dataset,
            ann_file=f"{basedir}/train_annt_fold_{fold}.json",
            img_prefix=f"{basedir}/QC/rgb",
            seg_prefix=f"{basedir}/QC/rgb_seg",
        )
    ),
    test=dict(
        type=dataset,
        ann_file=f"{basedir}/test_annt_fold_{fold}.json",
        img_prefix=f"{basedir}/QC/rgb",
        seg_prefix=f"{basedir}/QC/rgb_seg",
    ),
)
