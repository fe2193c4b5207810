# CoNIC (6 classes) — faithful to the reference recipe
# (configs/nuhtc/htc_lite_swin_pytorch_fpn_CoNIC_seasaw_CAS.py). Divergences
# from PanNuke reproduced here (diff vs the PanNuke config is the spec):
#   scale_factor = 4.0              (ref :7  — test rescale ×4)
#   rcnn max_per_img = 300          (ref :265)
#   train RandomCrop(128, 128) FIRST (ref :272 — before PhotoMetricDistortion,
#                                    so 128² crops resize 4× to 512² in train)
#   dataset paths/fold naming       (ref :343-359)
# Everything else (assigners, epochs, lr schedule, EMA, aug groups) matches
# PanNuke and is inherited.
_base_ = "./htc_lite_swin_fpn_pannuke.py"

fold = 1
num_classes = 6
scale_factor = 4.0
dataset_name = "CoNIC"
dataset = f"{dataset_name}CocoDataset"
basedir = "./datasets/CoNIC"
log_name = "nuhtc_tpu_conic"
seg_ignore_label = 0

model = dict(
    roi_head=dict(
        bbox_head=[
            dict(num_classes=num_classes, loss_cls=dict(num_classes=num_classes))
            for _ in range(3)
        ],
        mask_head=[dict(num_classes=num_classes)],
    ),
    test_cfg=dict(rcnn=dict(max_per_img=300)),
)

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)

# Full pipeline re-stated (list fields replace, not merge): identical to the
# PanNuke pipeline except the leading RandomCrop(128,128) (ref :272).
train_pipeline = [
    dict(type="RandomCrop", crop_size=(128, 128)),
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

data = dict(
    train=dict(
        dataset=dict(
            type=dataset,
            ann_file=f"{basedir}/{dataset_name}_annt_RLE_fold{(fold - 1) % 3 + 1}.json",
            img_prefix=f"{basedir}/Images/",
            seg_prefix=f"{basedir}/Images_seg",
        )
    ),
    test=dict(
        type=dataset,
        ann_file=f"{basedir}/{dataset_name}_annt_RLE_fold{(fold + 4) % 3 + 1}.json",
        img_prefix=f"{basedir}/Images/",
        seg_prefix=f"{basedir}/Images_seg",
    ),
)
