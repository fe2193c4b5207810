"""Cascade bbox head: Shared2FC + NormedLinear classifier + Seesaw activation.

Re-implements the reference's Shared2FCBBoxHeadWithProb
(nuhtc/models/bbox_head.py:213-292) and the SeesawLoss custom activation
(thirdparty/mmdetection/mmdet/models/losses/seesaw_loss.py:157-175):
cls_score has C+2 channels — softmax over the C class logits times the
positive-objectness softmax, background = negative-objectness.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import HEADS
from nuhtc_tpu.models.layers import DenseParams, NormedLinear

Dtype = Any


@HEADS.register()
class Shared2FCBBoxHeadWithProb(nn.Module):
    num_classes: int = 5
    in_channels: int = 64
    fc_out_channels: int = 256
    roi_feat_size: int = 7
    reg_class_agnostic: bool = True
    cls_temperature: float = 20.0
    dtype: Dtype = jnp.float32
    # reference config keys accepted for parity
    bbox_coder: Any = None
    cls_predictor_cfg: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None

    @property
    def cls_channels(self) -> int:
        return self.num_classes + 2  # Seesaw: classes + (pos, neg) objectness

    @nn.compact
    def __call__(self, roi_feats, fc0_pre: jnp.ndarray | None = None,
                 return_fc0: bool = False):
        """roi_feats: (R, S, S, C) or pre-flattened (R, S*S*C) in (i, j, c)
        order → (cls_score (R, C+2), bbox_pred (R, 4)).

        Flattening is (i, j, c) — the natural NHWC minor order, so no
        activation transpose (a measured ~9 ms/step relayout at B16×1512
        rois). Torch checkpoints flatten (c, i, j); the converter permutes
        the shared_fc0 weight rows instead (utils/checkpoint.py _roi_fc_w).

        Split-fc0 modes (the banded RoI scan folds the shared_fc0 matmul
        into its loop body so the (R, S*S*C) features never materialize —
        see roi_extractor.banded_stage_features ``fc0_kernel``):
          ``return_fc0=True`` → returns (kernel (S*S*C, F), bias (F,)).
          ``fc0_pre`` (R, F) pre-bias fc0 outputs → completes the head."""
        in_feat = self.in_channels * self.roi_feat_size**2
        w0, b0 = DenseParams(in_feat, self.fc_out_channels, name="shared_fc0")()
        if return_fc0:
            return w0, b0
        dt = self.dtype
        if fc0_pre is not None:
            x = nn.relu((fc0_pre + b0).astype(dt))
        else:
            r = roi_feats.shape[0]
            x = roi_feats if roi_feats.ndim == 2 else roi_feats.reshape(r, -1)
            x = nn.relu(jnp.dot(x.astype(dt), w0.astype(dt)) + b0.astype(dt))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype, name="shared_fc1")(x))
        cls_score = NormedLinear(
            features=self.cls_channels,
            temperature=self.cls_temperature,
            dtype=self.dtype,
            name="fc_cls",
        )(x)
        reg_out = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_out, dtype=self.dtype, name="fc_reg")(x)
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


@HEADS.register()
class Shared2FCBBoxHead(nn.Module):
    """Plain softmax Shared2FC head — the mmdet default used by the standalone
    MaskRCNN family (reference RoIHead_Partial over StandardRoIHead,
    nuhtc/models/roi_head_partial.py:9 + mmdet shared_2fc head): (C+1)-way
    softmax classifier + class-specific box regression."""

    num_classes: int = 8
    in_channels: int = 64
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    reg_class_agnostic: bool = False
    dtype: Dtype = jnp.float32
    # reference config keys accepted for parity
    bbox_coder: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        """roi_feats: (R, S, S, C) or flat (R, S*S*C), (i, j, c) order →
        (cls_score (R, C+1), bbox_pred (R, 4·C)). Same flatten convention as
        Shared2FCBBoxHeadWithProb (converter permutes torch fc0 rows)."""
        r = roi_feats.shape[0]
        x = roi_feats if roi_feats.ndim == 2 else roi_feats.reshape(r, -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype, name="shared_fc1")(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")(x)
        reg_out = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_out, dtype=self.dtype, name="fc_reg")(x)
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


def seesaw_activation(cls_score: jnp.ndarray) -> jnp.ndarray:
    """(..., C+2) raw logits → (..., C+1) scores (last = background)."""
    c = cls_score.shape[-1] - 2
    score_classes = jax.nn.softmax(cls_score[..., :c], axis=-1)
    score_obj = jax.nn.softmax(cls_score[..., c:], axis=-1)
    pos, neg = score_obj[..., :1], score_obj[..., 1:2]
    return jnp.concatenate([score_classes * pos, neg], axis=-1)
