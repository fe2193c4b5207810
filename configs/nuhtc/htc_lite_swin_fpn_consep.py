# CoNSeP (4 classes) — same recipe as PanNuke with dataset/class swaps
# (reference configs/nuhtc/htc_lite_swin_pytorch_fpn_CoNSeP_seasaw_CAS.py).
_base_ = "./htc_lite_swin_fpn_pannuke.py"

num_classes = 4
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
