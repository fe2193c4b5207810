# NuCLS (8 classes, partial mask annotations) — PanNuke recipe + partial
# supervision flags (reference configs/nuhtc/htc_lite_swin_pytorch_fpn_NuCLS_seasaw_CAS.py).
_base_ = "./htc_lite_swin_fpn_pannuke.py"

num_classes = 8
dataset_name = "NuCLS"
dataset = f"{dataset_name}CocoDataset"
basedir = "./datasets/NuCLS"
log_name = "nuhtc_tpu_nucls"
partial_masks = True  # instances with ismask=0 contribute no mask loss

model = dict(
    roi_head=dict(
        bbox_head=[
            dict(num_classes=num_classes, loss_cls=dict(num_classes=num_classes))
            for _ in range(3)
        ],
        mask_head=[dict(num_classes=num_classes)],
    )
)

data = dict(
    train=dict(
        dataset=dict(
            type=dataset,
            ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_train.json",
            img_prefix=f"{basedir}/rgb/",
            seg_prefix=f"{basedir}/rgb_seg",
        )
    ),
    test=dict(
        type=dataset,
        ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_test.json",
        img_prefix=f"{basedir}/rgb/",
        seg_prefix=f"{basedir}/rgb_seg",
    ),
)
