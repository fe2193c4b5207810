"""Loss functions (pure jnp) + registry wrappers for config parity.

Covers the reference loss inventory (nuhtc/models/losses/: DiceLoss,
SmoothTruncatedLoss, PartialDiceLoss, MultiLabelFocalLoss, WeightMSELoss,
WeightEXPLoss; plus mmdet SeesawLoss, CrossEntropyLoss, SmoothL1Loss used by
the configs). All functions are batched/staticly-shaped and take explicit
validity weights so padded samples contribute zero.

SeesawLoss (thirdparty/mmdetection/mmdet/models/losses/seesaw_loss.py) is
stateful in torch (per-class cumulative sample counts); here the counts are
explicit arguments threaded through the train state.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nuhtc_tpu.registry import LOSSES


# --------------------------------------------------------------------------- #
# reductions
# --------------------------------------------------------------------------- #
def weight_reduce(loss, weight=None, reduction="mean", avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # mean
    if avg_factor is None:
        if weight is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-12)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)


# --------------------------------------------------------------------------- #
# regression / classification primitives
# --------------------------------------------------------------------------- #
def smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def sigmoid_ce(logits, targets):
    """Binary cross entropy with logits (elementwise)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_ce(logits, labels, num_classes: Optional[int] = None):
    """Multiclass CE; labels are int. Out-of-range labels give 0 loss."""
    num_classes = num_classes or logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    return -jnp.sum(onehot * logp, axis=-1)


def sigmoid_focal(logits, targets, gamma: float = 2.0, alpha: float = 0.25):
    """Elementwise sigmoid focal loss (binary targets)."""
    p = jax.nn.sigmoid(logits)
    ce = sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * ((1 - p_t) ** gamma) * ce


# --------------------------------------------------------------------------- #
# dice family (reference nuhtc/models/losses/dice_loss.py:11-131)
# --------------------------------------------------------------------------- #
def dice_loss(pred, target, weight=None, eps: float = 1e-3, reduction="mean", avg_factor=None):
    """pred already activated (sigmoid). pred/target: (n, ...) flattened per row.

    Self-normalizing weights: per-sample weights are normalized to sum 1
    (reference dice_loss, dice_loss.py:44-52).
    """
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    t = target.reshape(n, -1).astype(p.dtype)
    a = jnp.sum(p * t, axis=1)
    b = jnp.sum(p * p, axis=1) + eps
    c = jnp.sum(t * t, axis=1) + eps
    loss = 1 - (2 * a) / (b + c)
    if weight is not None:
        wsum = jnp.sum(weight)
        weight = jnp.where(wsum == 0, jnp.ones_like(weight), weight / jnp.maximum(wsum, 1e-12))
        # after normalization the weighted mean is a weighted sum
        if reduction == "mean":
            return jnp.sum(loss * weight)
        # sum/none must also see the (normalized) weight — the reference
        # applies it for every reduction
        loss = loss * weight
    return weight_reduce(loss, None, reduction, avg_factor)


def trunc_loss(pred, target, gamma: float = 0.3, eps: float = 1e-3):
    """Smooth truncated loss on activated predictions (reference
    trunc_loss, trunc_loss.py:117-152). Returns per-sample mean."""
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    t = target.reshape(n, -1).astype(p.dtype)
    ret = jnp.where(t == 1, p, 1 - p)
    st = 0.5 - math.log(gamma) + ((t - 1) * (1 - p) ** 2 - t * p**2) / (2 * gamma**2)
    ll = jnp.where(ret < gamma, st, -jnp.log(ret + eps))
    return jnp.mean(ll, axis=1)


# --------------------------------------------------------------------------- #
# Seesaw loss (mmdet seesaw_loss.py, config p=0.8 q=2.0)
# --------------------------------------------------------------------------- #
def seesaw_ce(
    cls_logits: jnp.ndarray,  # (N, C) class logits (no objectness)
    labels: jnp.ndarray,  # (N,) int in [0, C)
    weights: jnp.ndarray,  # (N,) sample validity/positive mask
    cum_samples: jnp.ndarray,  # (C,) float class counts (state)
    p: float = 0.8,
    q: float = 2.0,
    eps: float = 1e-2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (per-sample loss (N,), updated cum_samples)."""
    c = cls_logits.shape[-1]
    onehot = jax.nn.one_hot(labels, c, dtype=cls_logits.dtype)
    new_cum = cum_samples + jnp.sum(onehot * weights[:, None], axis=0)

    seesaw = jnp.ones((c, c), cls_logits.dtype)
    if p > 0:
        # mmdet clamps both counts at 1 (unseen classes are not annihilated)
        cum_c = jnp.clip(new_cum, 1.0, None)
        ratio = cum_c[None, :] / cum_c[:, None]  # [gt, other]
        mitigation = jnp.where(ratio < 1, ratio**p, 1.0)
        seesaw = seesaw * mitigation
    if q > 0:
        scores = jax.nn.softmax(jax.lax.stop_gradient(cls_logits), axis=-1)
        self_scores = jnp.sum(scores * onehot, axis=-1, keepdims=True)
        score_ratio = scores / jnp.clip(self_scores, 1e-12, None)
        compensation = jnp.where(score_ratio > 1, score_ratio**q, 1.0)
    else:
        compensation = jnp.ones_like(cls_logits)

    sample_seesaw = seesaw[labels] * compensation  # (N, C)
    adjusted = cls_logits + jnp.log(jnp.clip(sample_seesaw, 1e-12, None)) * (1 - onehot)
    loss = softmax_ce(adjusted, labels)
    return loss * weights, new_cum


def seesaw_loss(
    cls_score: jnp.ndarray,  # (N, C+2)
    labels: jnp.ndarray,  # (N,) int in [0, C] (C = background)
    weights: jnp.ndarray,  # (N,) validity
    cum_samples: jnp.ndarray,  # (C,)
    p: float = 0.8,
    q: float = 2.0,
    loss_weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full SeesawLoss: (loss_classes, loss_objectness, new_cum_samples).

    Matches mmdet SeesawLoss.forward: objectness CE over (pos, neg) channels
    for all samples; seesaw CE over class channels for positive samples.
    """
    c = cls_score.shape[-1] - 2
    cls_logits = cls_score[:, :c]
    obj_logits = cls_score[:, c:]
    pos = (labels < c) & (weights > 0)
    obj_labels = (labels == c).astype(jnp.int32)

    loss_obj = weight_reduce(softmax_ce(obj_logits, obj_labels), weights, "mean")
    cls_labels = jnp.where(pos, labels, 0)
    per_sample, new_cum = seesaw_ce(
        cls_logits, cls_labels, pos.astype(cls_score.dtype), cum_samples, p, q
    )
    # mmdet normalizes the positive-class loss by the TOTAL sample count
    # (bbox head avg_factor), not by the positive count
    loss_cls = jnp.sum(per_sample) / jnp.maximum(jnp.sum(weights), 1.0)
    return loss_weight * loss_cls, loss_weight * loss_obj, new_cum


# --------------------------------------------------------------------------- #
# registry wrappers (config-constructible)
# --------------------------------------------------------------------------- #
@LOSSES.register()
class DiceLoss:
    def __init__(self, use_sigmoid=True, activate=True, reduction="mean", loss_weight=1.0, eps=1e-3):
        self.use_sigmoid, self.activate = use_sigmoid, activate
        self.reduction, self.loss_weight, self.eps = reduction, loss_weight, eps

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.activate and self.use_sigmoid:
            pred = jax.nn.sigmoid(pred)
        return self.loss_weight * dice_loss(pred, target, weight, self.eps, self.reduction, avg_factor)


@LOSSES.register()
class SmoothTruncatedLoss:
    def __init__(self, use_sigmoid=True, activate=True, reduction="mean", loss_weight=1.0, eps=1e-3, gamma=0.3):
        self.use_sigmoid, self.activate = use_sigmoid, activate
        self.reduction, self.loss_weight, self.eps, self.gamma = reduction, loss_weight, eps, gamma

    def __call__(self, pred, target, weight=None, avg_factor=None, mask=None):
        if self.activate and self.use_sigmoid:
            pred = jax.nn.sigmoid(pred)
            if mask is not None:
                pred = pred * mask
        ld = dice_loss(pred, target, weight, self.eps, self.reduction, avg_factor)
        lt = weight_reduce(trunc_loss(pred, target, self.gamma, self.eps), weight, self.reduction, avg_factor)
        return self.loss_weight * (ld + lt)


@LOSSES.register()
class PartialDiceLoss:
    def __init__(self, use_sigmoid=True, activate=True, reduction="mean", loss_weight=1.0, eps=1e-3, gamma=0.3):
        self.use_sigmoid, self.activate = use_sigmoid, activate
        self.reduction, self.loss_weight, self.eps = reduction, loss_weight, eps

    def __call__(self, pred, target, weight=None, avg_factor=None, mask=None):
        if self.activate and self.use_sigmoid:
            pred = jax.nn.sigmoid(pred)
            if mask is None:
                mask = ((target == 1) | (target == 0)).astype(pred.dtype)
            pred = pred * mask
            target = target * mask
        return self.loss_weight * dice_loss(pred, target, weight, self.eps, self.reduction, avg_factor)


@LOSSES.register()
class MultiLabelFocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25, reduction="mean", size_average=True, loss_weight=1.0):
        self.gamma, self.alpha = gamma, alpha
        self.reduction, self.size_average, self.loss_weight = reduction, size_average, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        num_classes = pred.shape[1]
        onehot = jax.nn.one_hot(target, num_classes + 1)[:, :num_classes]
        per_cls = []
        for idx in range(num_classes):
            l = sigmoid_focal(pred[:, idx], onehot[:, idx], self.gamma, self.alpha)
            per_cls.append(weight_reduce(l, weight, self.reduction, avg_factor))
        losses = jnp.stack(per_cls) * self.loss_weight
        return jnp.mean(losses) if self.size_average else jnp.sum(losses)


@LOSSES.register()
class WeightMSELoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction, self.loss_weight, self.eps = reduction, loss_weight, 1e-2

    def __call__(self, pred, target, weight=None, avg_factor=None):
        w = (2 - self.eps) * jax.lax.stop_gradient(target) + self.eps
        return self.loss_weight * weight_reduce((pred - target) ** 2, w, self.reduction, avg_factor)


@LOSSES.register()
class WeightEXPLoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction, self.loss_weight = reduction, loss_weight
        self.alpha, self.beta = 2.0, 1.0

    def __call__(self, pred, target, weight=None, avg_factor=None):
        w = self.alpha * jnp.exp(-self.beta * (jax.lax.stop_gradient(target) - 1) ** 2)
        return self.loss_weight * weight_reduce((pred - target) ** 2, w, self.reduction, avg_factor)


@LOSSES.register()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        self.beta, self.reduction, self.loss_weight = beta, reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * weight_reduce(
            smooth_l1(pred, target, self.beta), weight, self.reduction, avg_factor
        )


@LOSSES.register()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean", loss_weight=1.0):
        self.use_sigmoid, self.reduction, self.loss_weight = use_sigmoid, reduction, loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.use_sigmoid:
            l = sigmoid_ce(pred, target.astype(pred.dtype))
        else:
            l = softmax_ce(pred, target)
        return self.loss_weight * weight_reduce(l, weight, self.reduction, avg_factor)
