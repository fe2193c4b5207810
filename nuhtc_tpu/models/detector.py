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
    single_roi_features,
    adaptive_avg_pool_grid,
)
from nuhtc_tpu.ops import boxes as box_ops
from nuhtc_tpu.ops import nms as nms_ops
from nuhtc_tpu.ops.components import component_proposals

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
        self.mask_head = HTCMaskHead(
            in_channels=self.fpn_channels,
            conv_out_channels=self.fpn_channels,
            num_classes=self.num_classes,
            class_agnostic=True,
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
        dummy_rois = jnp.tile(jnp.asarray([[0.0, 0.0, 16.0, 16.0]]), (2, 1))
        for stage in range(self.num_stages):
            rf = jnp.zeros((2, 7, 7, self.fpn_channels), self.dtype)
            self.bbox_heads[stage](rf)
        mf = jnp.zeros((2, 14, 14, self.fpn_channels), self.dtype)
        self.mask_head(mf, res_feat=None, return_logits=True, return_feat=False)
        return None

    # ------------------------------------------------------------------ #
    def _bbox_stage(self, stage: int, feats, semantic_feat, rois):
        """Batched cascade stage. rois: (B, P, 4) → (cls (B,P,C+2), reg (B,P,4))."""
        b, p, _ = rois.shape

        def per_image(f_tuple, sem, r):
            rf = attention_roi_features(
                f_tuple,
                r,
                output_size=7,
                sampling_ratio=2,
                strides=self.strides,
                start_level=self.attn_start_level,
                thres=self.attn_thres,
            )
            sem_rf = single_roi_features(sem, r, output_size=14, stride=self.strides[0])
            rf = rf + adaptive_avg_pool_grid(sem_rf, 7)
            return rf

        roi_feats = jax.vmap(per_image)(tuple(feats), semantic_feat, rois)
        roi_feats = roi_feats.reshape(b * p, 7, 7, -1)
        cls_score, bbox_pred = self.bbox_heads[stage](roi_feats)
        return cls_score.reshape(b, p, -1), bbox_pred.reshape(b, p, 4)

    def _mask_forward(self, feats, semantic_feat, boxes):
        """boxes: (B, D, 4) in network-input frame → mask probs (B, D, 28, 28)."""
        b, d, _ = boxes.shape

        def per_image(f_tuple, sem, r):
            rf = attention_roi_features(
                f_tuple,
                r,
                output_size=14,
                sampling_ratio=0,
                strides=self.strides,
                start_level=self.attn_start_level,
                thres=self.attn_thres,
            )
            sem_rf = single_roi_features(sem, r, output_size=14, stride=self.strides[0])
            return rf + sem_rf

        mask_feats = jax.vmap(per_image)(tuple(feats), semantic_feat, boxes)
        mask_feats = mask_feats.reshape(b * d, 14, 14, -1)
        logits = self.mask_head(mask_feats, res_feat=None, return_logits=True, return_feat=False)
        probs = jax.nn.sigmoid(logits[..., 0])
        return probs.reshape(b, d, 28, 28)

    # ------------------------------------------------------------------ #
    def __call__(self, img, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Batched inference. img: (B, H, W, 3) normalized, H/W static.

        Returns dict of padded detections:
          boxes (B, D, 4) in ORIGINAL-image coords (input / scale_factor),
          scores (B, D), labels (B, D) int32, probs (B, D, num_classes),
          mask_probs (B, D, 28, 28), valid (B, D).
        """
        b, h, w, _ = img.shape
        img_shape = (h, w)

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
            ws_boxes5, ws_valid = jax.vmap(
                lambda sl: component_proposals(
                    sl[..., 0],
                    img_shape,
                    max_components=self.watershed_max,
                    min_area=self.watershed_min_area,
                )
            )(semantic_logits)
            # reference prepends watershed boxes to RPN proposals
            rois = jnp.concatenate([ws_boxes5[..., :4], prop_boxes], axis=1)
            rois_valid = jnp.concatenate([ws_valid, prop_valid], axis=1)
        else:
            rois = prop_boxes
            rois_valid = prop_valid

        # --- cascade ------------------------------------------------------
        ms_scores = []
        bbox_pred = None
        for stage in range(self.num_stages):
            cls_score, bbox_pred = self._bbox_stage(stage, feats, semantic_feat, rois)
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
        mask_probs = self._mask_forward(feats, semantic_feat, mask_boxes)
        det["mask_probs"] = mask_probs
        return det

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
