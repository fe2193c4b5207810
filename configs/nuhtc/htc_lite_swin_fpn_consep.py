# CoNSeP (4 classes) — faithful to the reference recipe
# (configs/nuhtc/htc_lite_swin_pytorch_fpn_CoNSeP_seasaw_CAS.py). Divergences
# from PanNuke reproduced (diff vs the PanNuke config is the spec):
#   max_epochs = 100                (ref :6)
#   rcnn assigner = MaxIoUAssigner  (ref :206-238 — behaviorally identical to
#                                    MaskIoUAssigner on the main path: the
#                                    reference calls assign() without
#                                    precomputed overlaps, htc_roi_head_cus.py
#                                    :2118-2121, so both reduce to MaxIoU)
#   rcnn max_per_img = 300          (ref :262)
#   lr step = [30, 80]              (ref :376)
#   max_keep_ckpts = 20             (ref :378)
#   single train/test split (no folds, ref :343-354)
# NOTE the reference CoNSeP config drops the explicit watershed_proposal=True
# kwarg (ref roi_head) — but the Lite head's default is True
# (htc_roi_head_cus.py:1891), so watershed proposals stay ON here too.
_base_ = "./htc_lite_swin_fpn_pannuke.py"

num_classes = 4
max_epochs = 100
dataset_name = "CoNSeP"
dataset = f"{dataset_name}CocoDataset"
basedir = "./datasets/CoNSeP"
log_name = "nuhtc_tpu_consep"

model = dict(
    roi_head=dict(
        bbox_head=[
            dict(num_classes=num_classes, loss_cls=dict(num_classes=num_classes))
            for _ in range(3)
        ],
        mask_head=[dict(num_classes=num_classes)],
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

lr_config = dict(policy="step", warmup_iters=1000, warmup_ratio=1e-3, step=[30, 80])
checkpoint_config = dict(interval=10, max_keep_ckpts=20)

data = dict(
    train=dict(
        dataset=dict(
            type=dataset,
            ann_file=f"{basedir}/train_annt_RLE_256_93.json",
            img_prefix=f"{basedir}/Train/256_93",
            seg_prefix=f"{basedir}/Train/256_93_seg",
        )
    ),
    test=dict(
        type=dataset,
        ann_file=f"{basedir}/test_annt_RLE_256_93.json",
        img_prefix=f"{basedir}/Test/256_93",
        seg_prefix=f"{basedir}/Test/256_93_seg",
    ),
)
