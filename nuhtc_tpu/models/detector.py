"""NuHTC detector: Hybrid Task Cascade, fully batched and static-shape.

Re-designs the reference inference path (HybridTaskCascade_Cus.simple_test →
HybridTaskCascadeRoIHead_Lite.simple_test, reference nuhtc/models/htc_cus.py:
110 and nuhtc/models/htc_roi_head_cus.py:2184-2377) as one jit-compiled
function over padded tensors:

  img (B, H, W, 3)
    → Swin-T → FPN (4 levels, NHWC)
    → RPN → per-image top-1000 proposals (padded + valid mask)
    → FusedSemanticHead → logits + embedding
    → component ("watershed") proposals from the semantic mask, prepended
    → 3-stage cascade: AttentionRoI features + pooled semantic fusion →
      Shared2FC+NormedLinear heads; inter-stage DeltaXYWH refinement;
      stage-averaged Seesaw scores
    → multiclass NMS (score 0.35, iou 0.5, per-class) → top 500 detections
    → single HTC mask head on detection boxes → 28×28 sigmoid probabilities

No per-image Python loops, no host round-trips: the reference's CPU watershed
hop (htc_roi_head_cus.py:284-342) runs on device as connected components.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import DETECTORS
from nuhtc_tpu.models.swin import SwinTransformer
from nuhtc_tpu.models.fpn import FPN
from nuhtc_tpu.models.rpn_head import RPNHead, rpn_proposals
from nuhtc_tpu.models.bbox_head import Shared2FCBBoxHeadWithProb, seesaw_activation
from nuhtc_tpu.models.mask_head import HTCMaskHead, FusedSemanticHead
from nuhtc_tpu.models.roi_extractor import (
    attention_roi_features,
    banded_stage_features,
    single_roi_features,
)
from nuhtc_tpu.ops import boxes as box_ops
from nuhtc_tpu.ops import nms as nms_ops
from nuhtc_tpu.ops.components import component_proposals_batched

Dtype = Any

# per-stage DeltaXYWH stds (reference config :94-135)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1), (0.033, 0.033, 0.067, 0.067))


@DETECTORS.register()
class NuHTC(nn.Module):
    """Flagship detector. ``__call__`` runs batched inference end-to-end."""

    num_classes: int = 5
    fpn_channels: int = 64
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_stages: int = 3
    # RoI extractor config (reference config :79-86, :146-172)
    attn_start_level: int = 2
    attn_thres: float = 0.965926
    # test cfg (reference config :256-266)
    rpn_nms_pre: int = 3000
    rpn_max_per_img: int = 1000
    rpn_nms_iou: float = 0.7
    rpn_min_bbox_size: float = 10.0
    rcnn_score_thr: float = 0.35
    rcnn_nms_iou: float = 0.5
    rcnn_max_per_img: int = 500
    mask_thr_binary: float = 0.5
    # watershed proposal branch (reference roi head kwargs)
    watershed_proposal: bool = True
    watershed_max: int = 512
    watershed_min_area: int = 10
    # test-time rescale: img was resized by this factor from original
    scale_factor: float = 2.0
    # candidate cap for multiclass NMS
    nms_candidates: int = 2048
    # RoI sampler for the cascade stages (reference nuhtc/datasets/samplers/):
    # "random" (RandomSampler, reference config default), "instance_balanced"
    # (InstanceBalancedPosSampler_Cus), or "ohem" (OHEMSampler_HTC — samples a
    # 2× random pool, forwards the bbox head once, keeps the hardest by
    # current seesaw cls loss; the interleaved mask re-sample stays random)
    rcnn_sampler: str = "random"
    # exact=True: f32/HIGHEST RoI-op internals (CPU parity testing; the TPU
    # path keeps the bf16 fast mode)
    exact_rois: bool = False
    # x-banded RoIAlign (ops/roi_align.py): inference sorts proposals by
    # x-center so each 16-roi chunk contracts one roi_band-column window of
    # the feature map instead of the full width — W/band fewer MXU FLOPs.
    # RoIs wider than their chunk window are exactly recomputed dense through
    # roi_overflow replacement slots. 0 disables (dense path everywhere);
    # exact_rois=True also disables it.
    # Default 24 (round 5): whole-model A/B 114.4 -> 124.7 tiles/s vs 32;
    # still fully exact — the pessimistic 8-64px mix overflows <= 9 rois
    # (x-sorted, chunk 16; census in BASELINE.md), 20x slot headroom. Bands
    # 16/20 bench faster still (128.4/126.7) but overflow 885/266 rois on
    # that mix — beyond any slot budget, so they'd silently clip wide RoIs.
    roi_band: int = 24
    roi_overflow: int = 128
    # banded extraction in the TRAIN step: sampled rois are sorted by x for
    # extraction and the head outputs unsorted back, so target alignment is
    # untouched. A wider band + larger repair budget than inference because
    # early-training proposals are arbitrary-width (negatives wider than the
    # repair capacity would train on x-clipped features). 0 = dense.
    train_roi_band: int = 64
    train_roi_overflow: int = 256
    # rois per banded-scan chunk: 16 beats 8 END-TO-END on v5e (114.2 vs
    # 113.9 tiles/s, round-4 A/B). The round-2 extractor probe said 8
    # (21.5 -> 19.7 ms/stage) but the isolated probe overweights slice
    # traffic vs the in-model schedule — trust whole-model bench only.
    roi_chunk: int = 16
    # 2-d banding: proposals additionally sort by y-stripe so each chunk also
    # reads a roi_yband-row window. Implemented and exact (same union repair),
    # but OFF by default: t1's contraction depth K drops 128 -> yband, and the
    # MXU pads K back to 128, so the FLOP cut never materializes while the
    # strided y-slice adds ~8 ms/step (measured on v5e — see BASELINE.md).
    # x-banding cuts N (the lane dim), which stays >= 128 — that one is real.
    roi_yband: int = 0
    # _Lite_Fuse variant (reference htc_roi_head_cus.py:2919): adds an n-class
    # HTCSegBranch whose per-class watershed instances form the result
    lite_fuse: bool = False
    fuse_max_instances: int = 256
    # beyond-reference auxiliary seg-branch objectives (per-instance dist L1
    # + global multilabel cls, the HTCSegHead recipe) — the reference
    # _Lite_Fuse trains only loss_binary_seg
    fuse_aux_losses: bool = False
    # lite=True → single mask head at the final stage only (reference
    # HybridTaskCascadeRoIHead_Lite, htc_roi_head_cus.py:1875). lite=False →
    # the full _Cus variant: a mask head per cascade stage with mask
    # info-flow (conv_res chaining), trained at every stage and merged
    # (sigmoid-averaged) at test (reference htc_roi_head_cus.py:142-234,
    # 405-470, 607-662).
    lite: bool = True
    backbone_cfg: Any = None
    dtype: Dtype = jnp.float32

    def setup(self):
        bcfg = dict(self.backbone_cfg or {})
        bcfg.setdefault("dtype", self.dtype)
        self.backbone = SwinTransformer(**bcfg)
        self.neck = FPN(out_channels=self.fpn_channels, dtype=self.dtype)
        self.rpn_head = RPNHead(
            in_channels=self.fpn_channels, feat_channels=self.fpn_channels, dtype=self.dtype
        )
        self.semantic_head = FusedSemanticHead(
            in_channels=self.fpn_channels,
            conv_out_channels=self.fpn_channels,
            num_classes=1,
            dtype=self.dtype,
        )
        self.bbox_heads = [
            Shared2FCBBoxHeadWithProb(
                num_classes=self.num_classes, in_channels=self.fpn_channels, dtype=self.dtype
            )
            for _ in range(self.num_stages)
        ]
        if self.lite:
            self.mask_head = HTCMaskHead(
                in_channels=self.fpn_channels,
                conv_out_channels=self.fpn_channels,
                num_classes=self.num_classes,
                class_agnostic=True,
                dtype=self.dtype,
            )
        else:  # _Cus: one mask head per stage, info-flow between them
            self.mask_heads = [
                HTCMaskHead(
                    in_channels=self.fpn_channels,
                    conv_out_channels=self.fpn_channels,
                    num_classes=self.num_classes,
                    class_agnostic=True,
                    with_conv_res=stage > 0,  # stage 0 has no incoming flow
                    dtype=self.dtype,
                )
                for stage in range(self.num_stages)
            ]
        if self.lite_fuse:
            from nuhtc_tpu.models.extra_heads import HTCSegBranch

            self.seg_branch = HTCSegBranch(
                in_channels=self.fpn_channels,
                conv_out_channels=self.fpn_channels,
                num_classes=self.num_classes,
                dtype=self.dtype,
            )

    # ------------------------------------------------------------------ #
    def extract_feats(self, img, deterministic: bool = True):
        """img: (B, H, W, 3) normalized → 4-level NHWC pyramid."""
        return self.neck(self.backbone(img, deterministic=deterministic))

    def init_forward(self, img):
        """Cheap parameter-shaping pass: touches every submodule without the
        proposal/NMS machinery. Use ``model.init(key, img, method='init_forward')``
        — much faster to trace than full inference on slow hosts."""
        feats = self.extract_feats(img)
        self.rpn_head(feats)
        _, semantic_feat = self.semantic_head(feats)
        for stage in range(self.num_stages):
            rf = jnp.zeros((2, 7, 7, self.fpn_channels), self.dtype)
            self.bbox_heads[stage](rf)
        mf = jnp.zeros((2, 14, 14, self.fpn_channels), self.dtype)
        if self.lite:
            self.mask_head(mf, res_feat=None, return_logits=True, return_feat=False)
        else:
            last = None
            for stage in range(self.num_stages):
                _, last = self.mask_heads[stage](mf, res_feat=last)
        if self.lite_fuse:
            self.seg_branch(img, semantic_feat)
        return None

    # ------------------------------------------------------------------ #
    def _roi_band(self, banded: bool) -> int | None:
        """x-band width for RoIAlign, or None for the dense path."""
        if banded and not self.exact_rois and self.roi_band > 0:
            return self.roi_band
        return None

    @property
    def _roi_yband(self) -> int | None:
        return self.roi_yband if self.roi_yband > 0 else None

    def _band_sort_key(self, boxes: jnp.ndarray, img_w: int) -> jnp.ndarray:
        """(.., 4) boxes → scalar sort key: y-stripe major, x-center minor —
        chunks of consecutive rois then share a compact (yband, band) feature
        window. ``img_w`` sizes the stripe multiplier so stripes can never
        interleave (xc = x1+x2 < 2·img_w < the 4·img_w stripe separation).
        Without y-banding the key degenerates to the plain x sort."""
        xc = boxes[..., 0] + boxes[..., 2]
        if self._roi_yband is None:
            return xc
        # stripe = 2/3 of the y-window: rois up to window/3 tall fit their
        # stripe's window; taller ones and stripe-straddling chunks fall back
        # to the exact dense repair (roi_overflow budget)
        stripe = max(1.0, self.roi_yband * self.strides[0] * 2.0 / 3.0)
        yq = jnp.floor((boxes[..., 1] + boxes[..., 3]) * (0.5 / stripe))
        return yq * float(4 * img_w) + xc

    def _bbox_stage(self, stage: int, feats, semantic_feat, rois, banded: bool = False,
                    band: int | None = None, overflow: int | None = None,
                    use_yband: bool = True):
        """Batched cascade stage. rois: (B, P, 4) → (cls (B,P,C+2), reg (B,P,4)).
        ``banded=True``: rois are x-sorted → banded RoIAlign (see roi_band).
        ``band``/``overflow`` override the inference defaults (the train path
        uses a wider band + larger repair budget — see train_roi_band).
        ``use_yband=False``: x-banding only — the train path sorts by x alone,
        so the (y-stripe, x) window assumption does not hold there."""
        b, p, _ = rois.shape
        if band is None:
            band = self._roi_band(banded)
        overflow = self.roi_overflow if overflow is None else overflow
        yband = self._roi_yband if use_yband else None

        if band is not None:
            # banded extraction with one union overflow repair per stage; the
            # head's shared_fc0 matmul is folded into the scan body so the
            # (B*P, 7*7*C) activation never materializes (bbox_head.py
            # split-fc0 modes). NUHTC_FC0_FOLD=0 is a perf-probe knob that
            # keeps fc0 in the head (measured: the fold WINS here, 99.4 ->
            # 106.8 tiles/s round 2 — unlike the mask conv0 fold).
            fold = os.environ.get("NUHTC_FC0_FOLD", "1") == "1"
            w0 = None
            if fold:
                w0, _ = self.bbox_heads[stage](None, return_fc0=True)

            def per_image(f_tuple, sem, r):
                return banded_stage_features(
                    f_tuple, sem, r, output_size=7, sampling_ratio=2,
                    strides=self.strides, start_level=self.attn_start_level,
                    thres=self.attn_thres, band=band,
                    overflow_slots=overflow, sem_pool_from=14,
                    fc0_kernel=w0, yband=yband, chunk=self.roi_chunk,
                )

            out = jax.vmap(per_image)(tuple(feats), semantic_feat, rois)
            if fold:
                cls_score, bbox_pred = self.bbox_heads[stage](
                    None, fc0_pre=out.reshape(b * p, -1)
                )
            else:
                c = feats[0].shape[-1]
                cls_score, bbox_pred = self.bbox_heads[stage](
                    out.reshape(b * p, 7, 7, c)
                )
            return cls_score.reshape(b, p, -1), bbox_pred.reshape(b, p, 4)
        else:
            def per_image(f_tuple, sem, r):
                rf = attention_roi_features(
                    f_tuple,
                    r,
                    output_size=7,
                    sampling_ratio=2,
                    strides=self.strides,
                    start_level=self.attn_start_level,
                    thres=self.attn_thres,
                    exact=self.exact_rois,
                )
                # exact fusion of adaptive_avg_pool2d(RoIAlign14, 7) — pool_from
                # doubles the adaptive sample grid instead of computing at 14²
                sem_rf = single_roi_features(
                    sem, r, output_size=7, stride=self.strides[0], pool_from=14,
                    exact=self.exact_rois,
                )
                return rf + sem_rf

            roi_feats = jax.vmap(per_image)(tuple(feats), semantic_feat, rois)
            roi_feats = roi_feats.reshape(b * p, 7, 7, -1)
        cls_score, bbox_pred = self.bbox_heads[stage](roi_feats)
        return cls_score.reshape(b, p, -1), bbox_pred.reshape(b, p, 4)

    def _mask_forward(self, feats, semantic_feat, boxes, banded: bool = False):
        """boxes: (B, D, 4) in network-input frame → mask probs (B, D, 28, 28)."""
        b, d, _ = boxes.shape
        band = self._roi_band(banded)

        if band is not None:
            # lite: the mask head's conv0 folds into the banded scan body
            # (mask_head.py split-conv0 modes; _Cus needs the raw features
            # for per-stage heads with info-flow, so it keeps them)
            w0c = None
            if self.lite and os.environ.get("NUHTC_MASK_CONV0_FOLD", "0") == "1":
                # OFF by default: the fold trades the (B,D,14,14,C)
                # activation for a 3x3 unfold-concat inside the scan body,
                # which costs MORE on v5e — end-to-end bench 97.0 -> 113.9
                # tiles/s with the fold disabled (round-4 A/B; the
                # unfold-concat to (…,196,576) dominated the trace at
                # ~8 ms/step). Machinery kept for re-testing on other shapes.
                w0c, _ = self.mask_head(None, return_conv0=True)

            def per_image(f_tuple, sem, r):
                return banded_stage_features(
                    f_tuple, sem, r, output_size=14, sampling_ratio=0,
                    strides=self.strides, start_level=self.attn_start_level,
                    thres=self.attn_thres, band=band,
                    overflow_slots=self.roi_overflow, yband=self._roi_yband,
                    chunk=self.roi_chunk, conv0_kernel=w0c,
                )

            mask_feats = jax.vmap(per_image)(tuple(feats), semantic_feat, boxes)
            if self.lite:
                logits = self.mask_head(
                    mask_feats.reshape(b * d, 14, 14, -1), res_feat=None,
                    return_logits=True, return_feat=False,
                    conv0_pre=w0c is not None,
                )
                return jax.nn.sigmoid(logits[..., 0]).reshape(b, d, 28, 28)
        else:
            def per_image(f_tuple, sem, r):
                rf = attention_roi_features(
                    f_tuple,
                    r,
                    output_size=14,
                    sampling_ratio=0,
                    strides=self.strides,
                    start_level=self.attn_start_level,
                    thres=self.attn_thres,
                    exact=self.exact_rois,
                )
                sem_rf = single_roi_features(sem, r, output_size=14,
                                             stride=self.strides[0],
                                             exact=self.exact_rois)
                return rf + sem_rf

            mask_feats = jax.vmap(per_image)(tuple(feats), semantic_feat, boxes)
        mask_feats = mask_feats.reshape(b * d, 14, 14, -1)
        if self.lite:
            logits = self.mask_head(
                mask_feats, res_feat=None, return_logits=True, return_feat=False
            )
            probs = jax.nn.sigmoid(logits[..., 0])
        else:
            # _Cus test-time merge: each stage head runs on the SAME final
            # mask feats with info-flow chaining; merge_aug_masks averages
            # the per-stage sigmoids (reference htc_roi_head_cus.py:636-662)
            last_feat = None
            probs = 0.0
            for stage in range(self.num_stages):
                logits, last_feat = self.mask_heads[stage](mask_feats, res_feat=last_feat)
                probs = probs + jax.nn.sigmoid(logits[..., 0])
            probs = probs / float(self.num_stages)
        return probs.reshape(b, d, 28, 28)

    # ------------------------------------------------------------------ #
    def __call__(self, img, deterministic: bool = True, bb_feats=None) -> Dict[str, jnp.ndarray]:
        """Batched inference. img: (B, H, W, 3) normalized, H/W static.

        ``bb_feats``: optional precomputed backbone pyramid (bypasses the
        Swin backbone — used by the composed torch-oracle parity test to
        pin the post-backbone chain in isolation).

        Returns dict of padded detections:
          boxes (B, D, 4) in ORIGINAL-image coords (input / scale_factor),
          scores (B, D), labels (B, D) int32, probs (B, D, num_classes),
          mask_probs (B, D, 28, 28), valid (B, D).
        """
        b, h, w, _ = img.shape
        img_shape = (h, w)

        if bb_feats is not None:
            feats = self.neck(bb_feats)
        else:
            feats = self.extract_feats(img, deterministic=deterministic)

        # --- RPN proposals ------------------------------------------------
        cls_scores, bbox_preds = self.rpn_head(feats)
        prop_boxes, prop_scores, prop_valid = rpn_proposals(
            cls_scores,
            bbox_preds,
            img_shape,
            strides=self.strides,
            nms_pre=self.rpn_nms_pre,
            max_per_img=self.rpn_max_per_img,
            nms_iou=self.rpn_nms_iou,
            min_bbox_size=self.rpn_min_bbox_size,
        )

        # --- semantic branch + component proposals ------------------------
        semantic_logits, semantic_feat = self.semantic_head(feats)

        if self.watershed_proposal:
            ws_boxes5, ws_valid = component_proposals_batched(
                semantic_logits[..., 0],
                img_shape,
                max_components=self.watershed_max,
                min_area=self.watershed_min_area,
            )
            # reference prepends watershed boxes to RPN proposals
            rois = jnp.concatenate([ws_boxes5[..., :4], prop_boxes], axis=1)
            rois_valid = jnp.concatenate([ws_valid, prop_valid], axis=1)
        else:
            rois = prop_boxes
            rois_valid = prop_valid

        # --- cascade ------------------------------------------------------
        # sort proposals once by (y-stripe, x-center) so banded RoIAlign
        # chunks are spatially coherent in both axes; the order is kept
        # through all stages (per-roi refinement preserves row identity) and
        # NMS is order-independent, so nothing downstream needs unsorting.
        if self._roi_band(True) is not None:
            order = jnp.argsort(self._band_sort_key(rois, w), axis=1)
            rois = jnp.take_along_axis(rois, order[..., None], axis=1)
            rois_valid = jnp.take_along_axis(rois_valid, order, axis=1)

        ms_scores = []
        bbox_pred = None
        for stage in range(self.num_stages):
            cls_score, bbox_pred = self._bbox_stage(
                stage, feats, semantic_feat, rois, banded=True
            )
            ms_scores.append(cls_score)
            if stage < self.num_stages - 1:
                rois = box_ops.delta2bbox(
                    rois, bbox_pred, stds=STAGE_STDS[stage], max_shape=img_shape
                )
        cls_score = sum(ms_scores) / float(len(ms_scores))
        scores_act = seesaw_activation(cls_score)  # (B, P, C+1)

        bboxes = box_ops.delta2bbox(
            rois, bbox_pred, stds=STAGE_STDS[self.num_stages - 1], max_shape=img_shape
        )
        # rescale to original frame for NMS (reference get_bboxes rescale=True)
        bboxes_ori = bboxes / self.scale_factor

        det = jax.vmap(self._multiclass_nms)(bboxes_ori, scores_act, rois_valid)

        # --- mask branch ----------------------------------------------------
        mask_boxes = det["boxes"] * self.scale_factor  # back to input frame
        if self._roi_band(True) is not None:
            # NMS output is score-ordered; re-sort by (y-stripe, x) for banded
            # extraction and unsort the mask probs back to detection order.
            morder = jnp.argsort(self._band_sort_key(mask_boxes, w), axis=1)
            minv = jnp.argsort(morder, axis=1)
            mask_probs = self._mask_forward(
                feats, semantic_feat,
                jnp.take_along_axis(mask_boxes, morder[..., None], axis=1),
                banded=True,
            )
            mask_probs = jnp.take_along_axis(
                mask_probs, minv[..., None, None], axis=1
            )
        else:
            mask_probs = self._mask_forward(feats, semantic_feat, mask_boxes)
        det["mask_probs"] = mask_probs
        return det

    def fuse_test(self, img, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """_Lite_Fuse inference (reference HybridTaskCascadeRoIHead_Lite_Fuse.
        simple_test, htc_roi_head_cus.py:3100-3296): run the n-class seg
        branch over raw image + semantic feature, upsample to the original
        frame (bilinear align_corners, reference :3528), then per-class
        watershed segmentation. The reference's 'ensemble' output is the
        watershed results alone (:3227, :3291) — cascade detections are
        computed but overwritten — so this returns only the fused instances.

        Returns dict:
          fuse_boxes (B, C, K, 5) [x1,y1,x2+1,y2+1,0.36] in original coords,
          fuse_valid (B, C, K), fuse_inst (B, C, Ho, Wo) int32 instance maps,
          fuse_roots (B, C, K) (mask k = fuse_inst == fuse_roots+1).
        """
        from nuhtc_tpu.ops.components import resize_align_corners
        from nuhtc_tpu.ops.watershed import watershed_segmentation

        if not self.lite_fuse:
            raise ValueError("model was built with lite_fuse=False")
        b, h, w, _ = img.shape
        oh, ow = int(round(h / self.scale_factor)), int(round(w / self.scale_factor))

        feats = self.extract_feats(img, deterministic=deterministic)
        _, semantic_feat = self.semantic_head(feats)
        _, seg_pred, _, _ = self.seg_branch(img, semantic_feat)
        # (B, H, W, C) → original frame (B, Ho, Wo, C)
        seg_ori = resize_align_corners(
            seg_pred.transpose(0, 3, 1, 2), (oh, ow)
        ).transpose(0, 2, 3, 1)

        boxes5, valid, inst, roots = jax.vmap(
            lambda s: watershed_segmentation(
                s,
                max_instances=self.fuse_max_instances,
                min_area=self.watershed_min_area,
            )
        )(seg_ori)
        return {
            "fuse_boxes": boxes5,
            "fuse_valid": valid,
            "fuse_inst": inst,
            "fuse_roots": roots,
        }

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #
    def compute_losses(self, img, batch, cum_samples, deterministic: bool = False):
        """Full HTC training losses, batched and static-shape.

        Mirrors the reference train path (HybridTaskCascade_Cus.forward_train
        → HybridTaskCascadeRoIHead_Lite.forward_train, reference
        nuhtc/models/htc_cus.py:43 and htc_roi_head_cus.py:2048-2182):
        RPN assign/sample/losses, train-cfg proposals, semantic Dice loss,
        watershed (component) proposal injection, 3 interleaved cascade
        stages with re-assignment, mask Dice loss at the final stage.

        batch keys: gt_boxes (B,G,4), gt_labels (B,G), gt_valid (B,G),
        gt_patches (B,G,M,M), gt_semantic (B,Hs,Ws) int.
        cum_samples: (num_stages, C) seesaw class counters.
        Returns (losses dict incl. "total", new_cum_samples).
        """
        from nuhtc_tpu.ops.anchors import grid_anchors
        from nuhtc_tpu.train import targets as T
        from nuhtc_tpu.models import losses as L

        gt_boxes = batch["gt_boxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        b, g = gt_labels.shape
        h, w = img.shape[1:3]
        img_shape = (h, w)
        rng = self.make_rng("sampling")

        feats = self.extract_feats(img, deterministic=deterministic)
        losses = {}

        # ---- RPN ---------------------------------------------------------
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [tuple(cs.shape[1:3]) for cs in cls_scores]
        anchors = jnp.asarray(
            np.concatenate(grid_anchors(featmap_sizes, self.strides, (4,), (0.5, 1.0, 2.0)))
        )
        inside = (
            (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
            & (anchors[:, 2] <= w) & (anchors[:, 3] <= h)
        )
        flat_cls = jnp.concatenate([c.reshape(b, -1) for c in cls_scores], axis=1)
        flat_reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds], axis=1)

        def rpn_single(key, gtb, gtl, gtv):
            assign = T.max_iou_assign(
                anchors, inside, gtb, gtv, gtl,
                pos_thr=0.7, neg_thr=0.3, min_pos_iou=0.3, match_low_quality=True,
            )
            samp = T.random_sample(key, assign, num=1024, pos_fraction=0.5, num_classes=1)
            tgt, _ = T.encode_stage_targets(anchors[samp.idx], samp, gtb, (1.0, 1.0, 1.0, 1.0))
            return samp.idx, samp.is_pos, samp.valid, tgt

        keys = jax.random.split(rng, b * (2 + 2 * self.num_stages)).reshape(
            b, 2 + 2 * self.num_stages, 2
        )
        r_idx, r_pos, r_val, r_tgt = jax.vmap(rpn_single)(
            keys[:, 0], gt_boxes, gt_labels, gt_valid
        )
        sel_cls = jnp.take_along_axis(flat_cls, r_idx, axis=1)
        sel_reg = jnp.take_along_axis(flat_reg, r_idx[..., None], axis=1)
        num_total = jnp.maximum(jnp.sum(r_val), 1.0)
        losses["loss_rpn_cls"] = (
            jnp.sum(L.sigmoid_ce(sel_cls, r_pos.astype(jnp.float32)) * r_val) / num_total
        )
        losses["loss_rpn_bbox"] = (
            jnp.sum(L.smooth_l1(sel_reg, r_tgt, beta=1.0 / 9.0) * r_pos[..., None]) / num_total
        )

        # train-cfg proposals (nms_pre 6000, max 3000)
        prop_boxes, prop_scores, prop_valid = rpn_proposals(
            cls_scores, bbox_preds, img_shape, strides=self.strides,
            nms_pre=6000, max_per_img=3000, nms_iou=self.rpn_nms_iou,
            min_bbox_size=self.rpn_min_bbox_size,
        )
        prop_boxes = jax.lax.stop_gradient(prop_boxes)

        # ---- semantic head -------------------------------------------------
        semantic_logits, semantic_feat = self.semantic_head(feats)
        gt_sem = batch["gt_semantic"]
        sem_target = (gt_sem != 0).astype(jnp.float32)
        losses["loss_semantic_seg"] = L.dice_loss(
            jax.nn.sigmoid(semantic_logits[..., 0]), sem_target
        )

        # ---- _Lite_Fuse seg-branch loss ------------------------------------
        # Reference _Lite_Fuse.forward_train (htc_roi_head_cus.py:3010-3012)
        # trains ONLY loss_binary_seg on the n-class seg branch. The dist/cls
        # auxiliary terms belong to the _Cus HTCSegHead recipe
        # (htc_seg_head_cus.py:150-235) and are available beyond-reference
        # via fuse_aux_losses=True. loss_partial semantics: pixels covered by
        # box-only instances (gt_ismask == 0) are excluded (unannotated).
        if self.lite_fuse:
            _, seg_pred, seg_dist, seg_cls = self.seg_branch(img, semantic_feat)
            fac = h // gt_sem.shape[1]
            sem_up = jnp.repeat(jnp.repeat(gt_sem, fac, axis=1), fac, axis=2)
            cls_ids = jnp.arange(1, self.num_classes + 1)
            gt_seg_c = (sem_up[..., None] == cls_ids).astype(jnp.float32)

            ismask = batch.get("gt_ismask")
            if ismask is not None:
                from nuhtc_tpu.ops.mask_paste import paste_masks

                def nonmask_union(gtb, gtp, ism, gtv):
                    full = paste_masks(gtp, gtb, (h, w), threshold=-1.0)
                    wgt = ((ism < 0.5) & gtv).astype(jnp.float32)
                    return jnp.max(full * wgt[:, None, None], axis=0)

                pos_mask = 1.0 - jnp.clip(jax.vmap(nonmask_union)(
                    gt_boxes, batch["gt_patches"], ismask, gt_valid
                ), 0.0, 1.0)
                pos_mask = jax.lax.stop_gradient(pos_mask)[..., None]
            else:
                pos_mask = 1.0

            seg_ce = L.sigmoid_ce(seg_pred, gt_seg_c) * pos_mask
            losses["loss_binary_seg"] = 0.2 * jnp.mean(seg_ce)

            if self.fuse_aux_losses:
                from nuhtc_tpu.models.extra_heads import soft_distance_target
                from nuhtc_tpu.ops.mask_paste import paste_masks

                # PER-INSTANCE normalized interior distance (HTCSegHead.loss
                # builds gt_dist instance-by-instance, :165-180 — a union
                # blob would erase the valley between touching nuclei)
                def inst_dist(gtb, gtp, keep):
                    full = paste_masks(gtp, gtb, (h, w), threshold=0.5)
                    full = full.astype(jnp.float32) * keep.astype(jnp.float32)[:, None, None]
                    return jnp.max(jax.vmap(soft_distance_target)(full), axis=0)

                keep = gt_valid if ismask is None else (gt_valid & (ismask > 0.5))
                gt_dist = jax.lax.stop_gradient(
                    jax.vmap(inst_dist)(gt_boxes, batch["gt_patches"], keep)
                )
                losses["loss_dist"] = 0.2 * jnp.mean(
                    jnp.abs(jax.nn.sigmoid(seg_dist)[..., None] - gt_dist[..., None])
                    * pos_mask
                )
                present = jax.vmap(
                    lambda lbl, v: jnp.zeros(self.num_classes).at[
                        jnp.where(v, lbl, 0)
                    ].max(v.astype(jnp.float32))
                )(gt_labels, gt_valid)
                losses["loss_global_cls"] = 0.2 * jnp.mean(
                    L.sigmoid_ce(seg_cls, present)
                )

        # ---- watershed proposal injection ---------------------------------
        if self.watershed_proposal:
            ws_boxes5, ws_valid = component_proposals_batched(
                jax.lax.stop_gradient(semantic_logits[..., 0]), img_shape,
                max_components=self.watershed_max, min_area=self.watershed_min_area,
            )
            proposals = jnp.concatenate([ws_boxes5[..., :4], prop_boxes], axis=1)
            proposals_valid = jnp.concatenate([ws_valid, prop_valid], axis=1)
        else:
            proposals, proposals_valid = prop_boxes, prop_valid

        # ---- cascade stages (interleaved) ----------------------------------
        stage_cfg = ((0.5, 0.5, 0.5), (0.6, 0.6, 0.6), (0.7, 0.7, 0.7))
        stage_lw = (1.0, 0.5, 0.25)
        new_cum = []

        sampler = self.rcnn_sampler
        for stage in range(self.num_stages):
            pos_thr, neg_thr, min_pos = stage_cfg[stage]

            def make_assign_sample(num, use_sampler):
                def assign_sample(key, props, pvalid, gtb, gtl, gtv):
                    cand = jnp.concatenate([gtb, props], axis=0)
                    cand_valid = jnp.concatenate([gtv, pvalid], axis=0)
                    assign = T.max_iou_assign(
                        cand, cand_valid, gtb, gtv, gtl,
                        pos_thr=pos_thr, neg_thr=neg_thr, min_pos_iou=min_pos,
                        match_low_quality=True,
                    )
                    if use_sampler == "instance_balanced":
                        from nuhtc_tpu.train.samplers import instance_balanced_sample

                        samp = instance_balanced_sample(
                            key, assign, num=num, pos_fraction=0.25,
                            num_classes=self.num_classes, num_gts=g,
                        )
                    else:
                        samp = T.random_sample(key, assign, num=num, pos_fraction=0.25,
                                               num_classes=self.num_classes)
                    rois = cand[samp.idx]
                    is_gt = samp.is_pos & (samp.idx < g)
                    return rois, samp, is_gt

                return assign_sample

            # OHEM mines hardest examples from a 2× random pool; the other
            # samplers select directly at the target size
            num_sel = 1024
            pool = 2 * num_sel if sampler == "ohem" else num_sel
            assign_sample = make_assign_sample(
                pool, "random" if sampler == "ohem" else sampler
            )

            rois, samp, is_gt = jax.vmap(assign_sample)(
                keys[:, 2 + 2 * stage], proposals, proposals_valid,
                gt_boxes, gt_labels, gt_valid,
            )

            if self.train_roi_band > 0 and not self.exact_rois:
                # banded extraction: sort rois by x for window coherence and
                # unsort the head outputs — targets keep the sampled order
                order = jnp.argsort(rois[..., 0] + rois[..., 2], axis=1)
                inv = jnp.argsort(order, axis=1)
                cls_s, reg_s = self._bbox_stage(
                    stage, feats, semantic_feat,
                    jnp.take_along_axis(rois, order[..., None], axis=1),
                    banded=True, band=self.train_roi_band,
                    overflow=self.train_roi_overflow, use_yband=False,
                )
                cls_score = jnp.take_along_axis(cls_s, inv[..., None], axis=1)
                bbox_pred = jnp.take_along_axis(reg_s, inv[..., None], axis=1)
            else:
                cls_score, bbox_pred = self._bbox_stage(stage, feats, semantic_feat, rois)

            if sampler == "ohem":
                # OHEMSampler_HTC analog (reference nuhtc/datasets/samplers/):
                # rank pool candidates by their CURRENT seesaw cls loss
                # (stop-gradient) and keep the hardest positives/negatives;
                # the already-computed pool head outputs are gathered so the
                # head runs once per stage
                from nuhtc_tpu.train.samplers import ohem_sample

                probs_pool = seesaw_activation(jax.lax.stop_gradient(cls_score))
                lbl = jnp.clip(samp.labels, 0, self.num_classes)  # neg → bg col
                ploss = -jnp.log(
                    jnp.take_along_axis(probs_pool, lbl[..., None], axis=2)[..., 0] + 1e-12
                )

                def sel_one(loss_i, gt_inds_i, is_pos_i, valid_i, labels_i):
                    pool_assign = T.AssignResult(
                        gt_inds=jnp.where(
                            is_pos_i, gt_inds_i + 1, jnp.where(valid_i, 0, -1)
                        ).astype(jnp.int32),
                        max_iou=jnp.zeros_like(loss_i),
                        labels=jnp.where(is_pos_i, labels_i, -1).astype(jnp.int32),
                    )
                    return ohem_sample(loss_i, pool_assign, num=num_sel,
                                       pos_fraction=0.25, num_classes=self.num_classes)

                sel = jax.vmap(sel_one)(
                    ploss, samp.gt_inds, samp.is_pos, samp.valid, samp.labels
                )
                take = lambda x: jnp.take_along_axis(x, sel.idx, axis=1)  # noqa: E731
                rois = jnp.take_along_axis(rois, sel.idx[..., None], axis=1)
                cls_score = jnp.take_along_axis(cls_score, sel.idx[..., None], axis=1)
                bbox_pred = jnp.take_along_axis(bbox_pred, sel.idx[..., None], axis=1)
                is_gt = take(is_gt) & sel.is_pos
                samp = T.SampleResult(
                    idx=take(samp.idx), is_pos=sel.is_pos, valid=sel.valid,
                    gt_inds=sel.gt_inds, labels=sel.labels,
                )

            # targets
            def stage_targets(r, s, gtb):
                return T.encode_stage_targets(r, s, gtb, STAGE_STDS[stage])

            bbox_tgt, bbox_w = jax.vmap(stage_targets)(rois, samp, gt_boxes)

            flat_w = samp.valid.reshape(-1).astype(jnp.float32)
            loss_cls, loss_obj, cum = L.seesaw_loss(
                cls_score.reshape(-1, self.num_classes + 2),
                samp.labels.reshape(-1),
                flat_w,
                cum_samples[stage],
            )
            avg = jnp.maximum(jnp.sum(flat_w), 1.0)
            loss_bbox = jnp.sum(
                L.smooth_l1(bbox_pred, bbox_tgt, beta=1.0) * bbox_w[..., None]
            ) / avg
            losses[f"s{stage}.loss_cls"] = stage_lw[stage] * loss_cls
            losses[f"s{stage}.loss_obj"] = stage_lw[stage] * loss_obj
            losses[f"s{stage}.loss_bbox"] = stage_lw[stage] * loss_bbox
            new_cum.append(cum)

            # interleaved refine + re-assign/re-sample
            refined = jax.lax.stop_gradient(
                box_ops.delta2bbox(rois, bbox_pred, stds=STAGE_STDS[stage], max_shape=img_shape)
            )
            refined_valid = samp.valid & ~is_gt
            # mask re-sample at the target size (random under ohem — the
            # pool/mining pass is only worth a second head forward for the
            # bbox branch)
            resample = make_assign_sample(
                num_sel, "random" if sampler == "ohem" else sampler
            )
            rois2, samp2, _ = jax.vmap(resample)(
                keys[:, 3 + 2 * stage], refined, refined_valid,
                gt_boxes, gt_labels, gt_valid,
            )
            proposals, proposals_valid = refined, refined_valid

            # ---- mask loss (re-sampled positives; sampler orders pos first).
            # Lite: final stage only (reference _Lite.forward_train:2144-2175).
            # _Cus: every stage, with mask info-flow (reference _Cus.
            # forward_train:443-474 + _mask_forward_train:142-185). ----------
            if (not self.lite) or stage == self.num_stages - 1:
                mask_cap = 256
                mrois = rois2[:, :mask_cap]
                mpos = samp2.is_pos[:, :mask_cap]
                mgt = samp2.gt_inds[:, :mask_cap]
                mask_logits = self._mask_train_forward(
                    feats, semantic_feat, mrois, stage=stage
                )

                def mk_targets(r, gi, gtb, gtp):
                    return T.mask_targets_from_patches(r, gi, gtb, gtp, mask_size=28)

                mtgt = jax.vmap(mk_targets)(mrois, mgt, gt_boxes, batch["gt_patches"])
                mprobs = jax.nn.sigmoid(mask_logits.reshape(-1, 28, 28))
                # NuCLS partial supervision: instances with ismask=0 (box-only
                # annotations) contribute no mask loss (reference RoIHead_Partial)
                ismask = batch.get("gt_ismask")
                mw = mpos.astype(jnp.float32)
                if ismask is not None:
                    mw = mw * jnp.take_along_axis(ismask, mgt, axis=1)
                losses[f"s{stage}.loss_mask"] = stage_lw[stage] * L.dice_loss(
                    mprobs, mtgt.reshape(-1, 28, 28), weight=mw.reshape(-1),
                )

        losses["total"] = sum(losses.values())
        return losses, jnp.stack(new_cum)

    def _mask_train_forward(self, feats, semantic_feat, boxes, stage: int | None = None):
        """(B, S, 4) → mask logits (B, S, 28, 28).

        Lite: single head, no info-flow (reference _Lite._mask_forward_train
        passes last_feat=None, htc_roi_head_cus.py:1977). _Cus: heads
        0..stage-1 run feature-only on the same RoI feats to build the
        info-flow ``last_feat``, then head ``stage`` predicts (reference
        _Cus._mask_forward_train:168-177)."""
        b, s, _ = boxes.shape

        inv = None
        if self.train_roi_band > 0 and not self.exact_rois:
            order = jnp.argsort(boxes[..., 0] + boxes[..., 2], axis=1)
            inv = jnp.argsort(order, axis=1)
            boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)

            def per_image(f_tuple, sem, r):
                return banded_stage_features(
                    f_tuple, sem, r, output_size=14, sampling_ratio=0,
                    strides=self.strides, start_level=self.attn_start_level,
                    thres=self.attn_thres, band=self.train_roi_band,
                    overflow_slots=self.train_roi_overflow, chunk=self.roi_chunk,
                )
        else:
            def per_image(f_tuple, sem, r):
                rf = attention_roi_features(
                    f_tuple, r, output_size=14, sampling_ratio=0,
                    strides=self.strides, start_level=self.attn_start_level,
                    thres=self.attn_thres,
                )
                sem_rf = single_roi_features(sem, r, output_size=14, stride=self.strides[0])
                return rf + sem_rf

        mf = jax.vmap(per_image)(tuple(feats), semantic_feat, boxes)
        mf = mf.reshape(b * s, 14, 14, -1)
        if self.lite:
            logits = self.mask_head(
                mf, res_feat=None, return_logits=True, return_feat=False
            )
        else:
            last = None
            for i in range(stage):
                last = self.mask_heads[i](
                    mf, res_feat=last, return_logits=False, return_feat=True
                )
            logits = self.mask_heads[stage](
                mf, res_feat=last, return_logits=True, return_feat=False
            )
        logits = logits[..., 0].reshape(b, s, 28, 28)
        if inv is not None:  # undo the band sort — targets use sampled order
            logits = jnp.take_along_axis(logits, inv[..., None, None], axis=1)
        return logits

    # ------------------------------------------------------------------ #
    def _multiclass_nms(self, boxes, scores, valid):
        """Single image. boxes (P, 4), scores (P, C+1), valid (P,) →
        padded top-`rcnn_max_per_img` detections (reference
        nuhtc/models/bbox_head.py:12-102 multiclass_nms semantics)."""
        p = boxes.shape[0]
        c = self.num_classes
        cls_scores = scores[:, :c]  # (P, C) drop background
        cand_scores = cls_scores.reshape(-1)  # p*C + cls
        cand_valid = (cand_scores > self.rcnn_score_thr) & jnp.repeat(valid, c)
        cand_labels = jnp.tile(jnp.arange(c, dtype=jnp.int32), p)
        cand_roi = jnp.repeat(jnp.arange(p, dtype=jnp.int32), c)

        k = min(self.nms_candidates, p * c)
        masked = jnp.where(cand_valid, cand_scores, nms_ops.NEG_INF)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        top_valid = top_scores > self.rcnn_score_thr
        top_boxes = boxes[cand_roi[top_idx]]
        top_labels = cand_labels[top_idx]
        top_roi = cand_roi[top_idx]

        ob, os_, oi, ov = nms_ops.batched_nms(
            top_boxes,
            jnp.where(top_valid, top_scores, nms_ops.NEG_INF),
            top_labels,
            top_valid,
            self.rcnn_nms_iou,
            self.rcnn_max_per_img,
            tile=256,  # measured best at the 2048-candidate shape (RPN keeps 128)
            coord_bound=jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0)),
        )
        out_labels = jnp.where(ov, top_labels[oi], -1)
        out_probs = jnp.where(ov[:, None], cls_scores[top_roi[oi]], 0.0)
        return {
            "boxes": ob,
            "scores": jnp.where(ov, os_, 0.0),
            "labels": out_labels,
            "probs": out_probs,
            "valid": ov,
        }
