"""Standalone Mask R-CNN family (partial-mask supervision path).

Re-designs the reference's semi/partial-supervision detectors as one batched
static-shape module:

- ``MaskRCNN_Cus`` / ``HTCMaskHead_Cus`` (reference nuhtc/models/
  mask_rcnn_part.py:11-122 and htc_mask_rcnn_cus.py:11-122): standard
  Mask R-CNN plus an auxiliary "mid seg" head — the stride-4 FPN feature is
  pixel-shuffled back to image resolution (einops ``b (p1 p2 c) h w → b c
  (h p1) (w p2)``, p=4), concatenated with the raw image, and a single 3×3
  conv predicts a binary foreground map trained with BCE against the union
  of GT instance masks (``loss_first_seg``, mask_rcnn_part.py:103-122).
- ``RoIHead_Partial`` (reference nuhtc/models/roi_head_partial.py:9-144):
  the bbox branch trains on ALL annotations, while the mask branch re-assigns
  and re-samples against only the ``ismask==1`` subset (instances with real
  mask annotations — NuCLS has box-only labels) so box-only instances never
  contribute mask gradients.

TPU-native shape: one jit graph, padded proposals + validity masks, the
mask-branch re-assignment done by zeroing ``gt_valid`` outside the ismask
subset (identical selection semantics, no ragged subsetting).

The reference family runs on a ResNet-50 FPN from vendored mmdet; here the
backbone is pluggable and defaults to the framework's Swin-T.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import DETECTORS
from nuhtc_tpu.models.swin import SwinTransformer
from nuhtc_tpu.models.fpn import FPN
from nuhtc_tpu.models.rpn_head import RPNHead, rpn_proposals
from nuhtc_tpu.models.bbox_head import Shared2FCBBoxHead
from nuhtc_tpu.models.mask_head import HTCMaskHead
from nuhtc_tpu.models.roi_extractor import multilevel_roi_features
from nuhtc_tpu.ops import boxes as box_ops
from nuhtc_tpu.ops import nms as nms_ops

Dtype = Any

# faster-rcnn/mask-rcnn defaults (reference configs/nuhtc/base.py _base_)
BBOX_STDS = (0.1, 0.1, 0.2, 0.2)


@DETECTORS.register()
class MaskRCNN(nn.Module):
    """Single-stage Mask R-CNN with mid-seg aux head and partial-mask training."""

    num_classes: int = 8  # NuCLS
    fpn_channels: int = 64
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    # test cfg (mmdet faster/mask-rcnn defaults)
    rpn_nms_pre: int = 1000
    rpn_max_per_img: int = 1000
    rpn_nms_iou: float = 0.7
    rpn_min_bbox_size: float = 0.0
    anchor_scale: float = 8.0  # mmdet faster-rcnn default octave scale
    rcnn_score_thr: float = 0.05
    rcnn_nms_iou: float = 0.5
    rcnn_max_per_img: int = 100
    nms_candidates: int = 1024
    mask_thr_binary: float = 0.5  # InferenceEngine paste threshold
    scale_factor: float = 1.0
    with_mid_seg: bool = True
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
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=self.fpn_channels, dtype=self.dtype
        )
        # class-specific FCN mask head (StandardRoIHead default)
        self.mask_head = HTCMaskHead(
            in_channels=self.fpn_channels,
            conv_out_channels=self.fpn_channels,
            num_classes=self.num_classes,
            class_agnostic=False,
            with_conv_res=False,
            dtype=self.dtype,
        )
        if self.with_mid_seg:
            # reference conv_last: Conv2d(4+3, 1, k=3) over [img, pixel-shuffled x0]
            self.conv_last = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                                     name="conv_last")

    # ------------------------------------------------------------------ #
    def extract_feats(self, img, deterministic: bool = True):
        return self.neck(self.backbone(img, deterministic=deterministic))

    def _mid_seg_logits(self, img, feat0):
        """Pixel-shuffle the stride-4 feature to image resolution and fuse with
        the raw image (reference mask_rcnn_part.py:74-76). feat0 NHWC."""
        b, h4, w4, c = feat0.shape
        p = 4
        cs = c // (p * p)
        # einops 'b (p1 p2 c) h w -> b c (h p1) (w p2)' in NHWC layout
        x = feat0.reshape(b, h4, w4, p, p, cs)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h4 * p, w4 * p, cs)
        fused = jnp.concatenate([img.astype(self.dtype), x], axis=-1)
        return self.conv_last(fused)[..., 0].astype(jnp.float32)  # (B, H, W)

    def _roi_forward(self, feats, rois):
        """(B, P, 4) → cls (B, P, C+1), reg (B, P, 4·C)."""
        b, p, _ = rois.shape

        def per_image(f_tuple, r):
            return multilevel_roi_features(
                f_tuple, r, output_size=7, sampling_ratio=0, strides=self.strides
            )

        rf = jax.vmap(per_image)(tuple(feats), rois)
        cls, reg = self.bbox_head(rf.reshape(b * p, 7, 7, -1))
        return cls.reshape(b, p, -1), reg.reshape(b, p, -1)

    def _mask_forward(self, feats, boxes):
        """(B, D, 4) → per-class mask logits (B, D, 28, 28, C)."""
        b, d, _ = boxes.shape

        def per_image(f_tuple, r):
            return multilevel_roi_features(
                f_tuple, r, output_size=14, sampling_ratio=0, strides=self.strides
            )

        mf = jax.vmap(per_image)(tuple(feats), boxes)
        logits = self.mask_head(
            mf.reshape(b * d, 14, 14, -1), res_feat=None,
            return_logits=True, return_feat=False,
        )
        return logits.reshape(b, d, 28, 28, self.num_classes)

    def init_forward(self, img):
        feats = self.extract_feats(img)
        self.rpn_head(feats)
        if self.with_mid_seg:
            self._mid_seg_logits(img, feats[0])
        rf = jnp.zeros((2, 7, 7, self.fpn_channels), self.dtype)
        self.bbox_head(rf)
        mf = jnp.zeros((2, 14, 14, self.fpn_channels), self.dtype)
        self.mask_head(mf, res_feat=None, return_logits=True, return_feat=False)
        return None

    # ------------------------------------------------------------------ #
    def __call__(self, img, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Batched inference → padded detections + per-detection mask probs."""
        b, h, w, _ = img.shape
        img_shape = (h, w)
        feats = self.extract_feats(img, deterministic=deterministic)

        cls_scores, bbox_preds = self.rpn_head(feats)
        prop_boxes, _, prop_valid = rpn_proposals(
            cls_scores, bbox_preds, img_shape, strides=self.strides,
            scales=(self.anchor_scale,),
            nms_pre=self.rpn_nms_pre, max_per_img=self.rpn_max_per_img,
            nms_iou=self.rpn_nms_iou, min_bbox_size=self.rpn_min_bbox_size,
        )

        cls, reg = self._roi_forward(feats, prop_boxes)
        scores = jax.nn.softmax(cls, axis=-1)  # (B, P, C+1)
        # class-specific decode: (B, P, C, 4)
        p = prop_boxes.shape[1]
        reg = reg.reshape(b, p, self.num_classes, 4)
        boxes_pc = jax.vmap(
            lambda r, d: box_ops.delta2bbox(
                jnp.repeat(r[:, None, :], self.num_classes, 1).reshape(-1, 4),
                d.reshape(-1, 4), stds=BBOX_STDS, max_shape=img_shape,
            ).reshape(p, self.num_classes, 4)
        )(prop_boxes, reg)
        boxes_pc = boxes_pc / self.scale_factor

        det = jax.vmap(self._multiclass_nms)(boxes_pc, scores, prop_valid)

        mask_boxes = det["boxes"] * self.scale_factor
        mask_logits = self._mask_forward(feats, mask_boxes)
        # select the detected class channel
        lbl = jnp.clip(det["labels"], 0, self.num_classes - 1)
        sel = jax.nn.one_hot(lbl, self.num_classes, dtype=mask_logits.dtype)
        det["mask_probs"] = jax.nn.sigmoid(
            jnp.einsum("bdhwc,bdc->bdhw", mask_logits, sel)
        )
        return det

    def _multiclass_nms(self, boxes_pc, scores, valid):
        """boxes_pc (P, C, 4) class-specific, scores (P, C+1), valid (P,)."""
        p = boxes_pc.shape[0]
        c = self.num_classes
        cand_scores = scores[:, :c].reshape(-1)
        cand_valid = (cand_scores > self.rcnn_score_thr) & jnp.repeat(valid, c)
        cand_labels = jnp.tile(jnp.arange(c, dtype=jnp.int32), p)
        cand_roi = jnp.repeat(jnp.arange(p, dtype=jnp.int32), c)
        cand_boxes = boxes_pc.reshape(-1, 4)

        k = min(self.nms_candidates, p * c)
        masked = jnp.where(cand_valid, cand_scores, nms_ops.NEG_INF)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        top_valid = top_scores > self.rcnn_score_thr
        top_boxes = cand_boxes[top_idx]
        top_labels = cand_labels[top_idx]
        top_roi = cand_roi[top_idx]

        ob, os_, oi, ov = nms_ops.batched_nms(
            top_boxes,
            jnp.where(top_valid, top_scores, nms_ops.NEG_INF),
            top_labels, top_valid, self.rcnn_nms_iou, self.rcnn_max_per_img,
            coord_bound=jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0)),
        )
        return {
            "boxes": ob,
            "scores": jnp.where(ov, os_, 0.0),
            "labels": jnp.where(ov, top_labels[oi], -1),
            "probs": jnp.where(ov[:, None], scores[:, :c][top_roi[oi]], 0.0),
            "valid": ov,
        }

    # ------------------------------------------------------------------ #
    def compute_losses(self, img, batch, cum_samples=None, deterministic: bool = False):
        """Training losses: RPN + bbox (all GT) + mask (ismask subset only) +
        mid-seg BCE (reference forward_train, mask_rcnn_part.py:35-101 and
        roi_head_partial.py:12-101).

        batch keys: gt_boxes (B,G,4), gt_labels (B,G), gt_valid (B,G),
        gt_patches (B,G,M,M), gt_semantic (B,H/4,W/4) int,
        gt_ismask (B,G) ∈ {0,1} (optional; default all-1).

        ``cum_samples`` is accepted for driver compatibility (NuHTC's seesaw
        counters — unused here, passed through unchanged): when given, the
        return is ``(losses, cum_samples)`` matching make_train_step's
        contract; otherwise just ``losses``."""
        from nuhtc_tpu.ops.anchors import grid_anchors
        from nuhtc_tpu.train import targets as T
        from nuhtc_tpu.models import losses as L

        gt_boxes = batch["gt_boxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        ismask = batch.get("gt_ismask")
        if ismask is None:
            ismask = jnp.ones_like(gt_valid, jnp.float32)
        b, g = gt_labels.shape
        h, w = img.shape[1:3]
        img_shape = (h, w)
        rng = self.make_rng("sampling")

        feats = self.extract_feats(img, deterministic=deterministic)
        losses = {}

        # ---- RPN (sample 256 @ pos_fraction .5, mmdet default) -------------
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [tuple(cs.shape[1:3]) for cs in cls_scores]
        anchors = jnp.asarray(
            np.concatenate(grid_anchors(featmap_sizes, self.strides, (self.anchor_scale,), (0.5, 1.0, 2.0)))
        )
        inside = (
            (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
            & (anchors[:, 2] <= w) & (anchors[:, 3] <= h)
        )
        flat_cls = jnp.concatenate([c.reshape(b, -1) for c in cls_scores], axis=1)
        flat_reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds], axis=1)

        keys = jax.random.split(rng, b * 3).reshape(b, 3, 2)

        def rpn_single(key, gtb, gtl, gtv):
            assign = T.max_iou_assign(
                anchors, inside, gtb, gtv, gtl,
                pos_thr=0.7, neg_thr=0.3, min_pos_iou=0.3, match_low_quality=True,
            )
            samp = T.random_sample(key, assign, num=256, pos_fraction=0.5, num_classes=1)
            tgt, _ = T.encode_stage_targets(anchors[samp.idx], samp, gtb, (1.0, 1.0, 1.0, 1.0))
            return samp.idx, samp.is_pos, samp.valid, tgt

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

        prop_boxes, _, prop_valid = rpn_proposals(
            cls_scores, bbox_preds, img_shape, strides=self.strides,
            scales=(self.anchor_scale,),
            nms_pre=2000, max_per_img=1000, nms_iou=self.rpn_nms_iou,
            min_bbox_size=self.rpn_min_bbox_size,
        )
        prop_boxes = jax.lax.stop_gradient(prop_boxes)

        # ---- bbox branch: all GT -------------------------------------------
        def assign_sample(key, gtb, gtl, gtv, props, pvalid):
            cand = jnp.concatenate([gtb, props], axis=0)
            cand_valid = jnp.concatenate([gtv, pvalid], axis=0)
            assign = T.max_iou_assign(
                cand, cand_valid, gtb, gtv, gtl,
                pos_thr=0.5, neg_thr=0.5, min_pos_iou=0.5, match_low_quality=False,
            )
            samp = T.random_sample(key, assign, num=512, pos_fraction=0.25,
                                   num_classes=self.num_classes)
            return cand[samp.idx], samp

        rois, samp = jax.vmap(assign_sample)(
            keys[:, 1], gt_boxes, gt_labels, gt_valid, prop_boxes, prop_valid
        )
        cls, reg = self._roi_forward(feats, rois)
        s = rois.shape[1]
        reg = reg.reshape(b, s, self.num_classes, 4)
        # class-specific regression: pick the target-class delta
        lbl = jnp.clip(samp.labels, 0, self.num_classes - 1)
        reg_sel = jnp.take_along_axis(reg, lbl[..., None, None].astype(jnp.int32), axis=2)[
            :, :, 0, :
        ]

        def stage_targets(r, sm, gtb):
            return T.encode_stage_targets(r, sm, gtb, BBOX_STDS)

        bbox_tgt, bbox_w = jax.vmap(stage_targets)(rois, samp, gt_boxes)
        flat_w = samp.valid.reshape(-1).astype(jnp.float32)
        avg = jnp.maximum(jnp.sum(flat_w), 1.0)
        losses["loss_cls"] = (
            jnp.sum(
                L.softmax_ce(cls.reshape(-1, self.num_classes + 1), samp.labels.reshape(-1))
                * flat_w
            )
            / avg
        )
        losses["loss_bbox"] = (
            jnp.sum(L.smooth_l1(reg_sel, bbox_tgt, beta=1.0) * bbox_w[..., None]) / avg
        )

        # ---- mask branch: ismask==1 subset only ----------------------------
        # identical selection semantics to the reference's re-assign over the
        # masked GT subset: invalidate box-only GT before assignment
        mask_gt_valid = gt_valid & (ismask > 0.5)
        mrois, msamp = jax.vmap(assign_sample)(
            keys[:, 2], gt_boxes, gt_labels, mask_gt_valid, prop_boxes, prop_valid
        )
        mask_cap = 128
        mrois_c = mrois[:, :mask_cap]
        mpos = msamp.is_pos[:, :mask_cap]
        mgt = msamp.gt_inds[:, :mask_cap]
        mlbl = jnp.clip(msamp.labels[:, :mask_cap], 0, self.num_classes - 1)
        mask_logits = self._mask_forward(feats, mrois_c)  # (B, S, 28, 28, C)
        sel = jax.nn.one_hot(mlbl, self.num_classes, dtype=mask_logits.dtype)
        mask_logits_sel = jnp.einsum("bshwc,bsc->bshw", mask_logits, sel)

        def mk_targets(r, gi, gtb, gtp):
            return T.mask_targets_from_patches(r, gi, gtb, gtp, mask_size=28)

        mtgt = jax.vmap(mk_targets)(mrois_c, mgt, gt_boxes, batch["gt_patches"])
        mvalid = mpos.astype(jnp.float32)
        mavg = jnp.maximum(jnp.sum(mvalid) * 28 * 28, 1.0)
        losses["loss_mask"] = (
            jnp.sum(L.sigmoid_ce(mask_logits_sel, mtgt) * mvalid[..., None, None]) / mavg
        )

        # ---- mid-seg aux loss ----------------------------------------------
        if self.with_mid_seg:
            mid = self._mid_seg_logits(img, feats[0])  # (B, H, W)
            # union of GT instance masks == semantic GT != 0 (nearest ×4 up)
            sem = (batch["gt_semantic"] != 0).astype(jnp.float32)
            sem_full = jnp.repeat(jnp.repeat(sem, 4, axis=1), 4, axis=2)
            sem_full = sem_full[:, :h, :w]
            losses["loss_mid_seg"] = jnp.mean(L.sigmoid_ce(mid, sem_full))

        losses["total"] = sum(losses.values())
        if cum_samples is not None:
            return losses, cum_samples
        return losses
