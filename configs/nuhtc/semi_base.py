# Semi-supervised teacher-student template over the standalone Mask R-CNN
# (reference configs/nuhtc/base.py: faster-rcnn + MultiSteamDetector
# semi_wrapper with MeanTeacher EMA; reference nuhtc/models/
# multi_stream_detector.py + mask_rcnn_part.py).
#
# TPU-native analog: one functional MaskRCNN module, teacher/student as two
# parameter trees (nuhtc_tpu/models/semi.py MultiStreamDetector /
# TeacherStudentState), pseudo labels from the teacher under stop_gradient.

num_classes = 8  # NuCLS
dataset_name = "NuCLS"
dataset = f"{dataset_name}CocoDataset"
basedir = "./datasets/NuCLS"
log_name = "semi_maskrcnn_nucls"
work_dir = "./work_dirs/${log_name}"

model = dict(
    type="MaskRCNN",
    num_classes=num_classes,
    fpn_channels=64,
    with_mid_seg=True,  # loss_first_seg aux head (mask_rcnn_part.py:103)
    rcnn_score_thr=0.05,
    rcnn_nms_iou=0.5,
    rcnn_max_per_img=100,
)

semi_wrapper = dict(
    type="MultiStreamDetector",
    score_thr=0.9,  # pseudo_label_initial_score_thr progression start
    max_gt=128,
    unsup_weight=2.0,
    burn_in=2000,  # sup-only steps before the unsup branch engages
    warm_up=100,  # MeanTeacher momentum warmup (reference mean_teacher.py:46)
)

# sup:unsup mix per batch (DistributedGroupSemiBalanceSampler analog)
sup_ratio = 0.5
# student strong-view photometric pipeline (teacher sees the weak view);
# default PhotoMetricDistortion when unset
unsup_strong_pipeline = [dict(type="PhotoMetricDistortion")]

# MeanTeacher EMA (reference mean_teacher.py hook; momentum 0.999)
ema = dict(momentum=0.001)

# evaluate both streams each eval interval (SubModulesDistEvalHook analog)
evaluated_modules = ["teacher", "student"]

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05)
lr_config = dict(warmup_iters=1000, step=[30, 160])

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    train=dict(
        type="SemiDataset",
        sup=dict(
            type=dataset,
            ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_train.json",
            img_prefix=f"{basedir}/rgb/",
            seg_prefix=f"{basedir}/rgb_seg",
        ),
        unsup=dict(
            type=dataset,
            ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_unlabeled.json",
            img_prefix=f"{basedir}/rgb/",
        ),
    ),
    test=dict(
        type=dataset,
        ann_file=f"./coco/{dataset_name}/{dataset_name}_annt_RLE_test.json",
        img_prefix=f"{basedir}/rgb/",
        seg_prefix=f"{basedir}/rgb_seg",
    ),
)
