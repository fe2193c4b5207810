# Flagship-model synthetic-PanNuke config — the bf16-vs-f32 accuracy
# experiment (tools/misc/bf16_pq_experiment.py).
#
# Unlike htc_lite_tiny_synthetic.py (shrunk model for the CPU e2e chain),
# this keeps the FULL Swin-T flagship architecture and the production test
# pipeline (256px tiles ×2 rescale) so the bf16 production path being
# measured is exactly the one bench.py times: banded RoI extraction, fused
# Swin block kernels, bf16 matmuls. Only the data roots (synthetic COCO
# layout out of $NUHTC_SYN_ROOT) and the training schedule change — the
# short warmup makes a few-hundred-step run reach a non-trivial PQ on the
# easy synthetic tiles (the flagship's 1000-iter warmup keeps lr at 1e-7..
# 1e-5 for longer than the whole experiment).

import os

_base_ = "./htc_lite_swin_fpn_pannuke.py"

_root = os.environ.get("NUHTC_SYN_ROOT", "./work_dirs/pannuke_syn")

max_epochs = 10
checkpoint_interval = 10
evaluation = dict(interval=1000, metric=["segm"])  # eval happens in the experiment script
lr_config = dict(policy="step", warmup_iters=100, warmup_ratio=1e-2, step=[1000000])

data = dict(
    train=dict(
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
