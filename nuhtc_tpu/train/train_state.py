"""Optimizer, schedules, EMA, and the pjit train step.

Mirrors the reference recipe (nuhtc/apis/train.py:100-208 + config :365-401):
AdamW lr 1e-4 betas (0.9, 0.999) wd 0.05 with decay_mult 0 for
absolute_pos_embed / relative_position_bias_table / any norm param;
step LR ([30, 160] epochs, ×0.1) with 1000-iter linear warmup (ratio 1e-3);
LinearMomentumEMA (m=2e-4); backbone stage-0 frozen until the FineTune
iteration (reference nuhtc/utils/hooks/params_adjust.py:6-13, iter 15000).

Parallelism: pure data parallel over a 1-D ``Mesh(('data',))`` — params and
optimizer state replicated, batch sharded; gradient all-reduce is inserted by
XLA (the TPU-native equivalent of the reference's NCCL DDP, SURVEY.md §2d).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    cum_samples: jnp.ndarray  # (num_stages, num_classes)


class SemiTrainState(NamedTuple):
    """Teacher/student state for semi-supervised training (the reference's
    MultiSteamDetector + MeanTeacher hook pair, nuhtc/models/
    multi_stream_detector.py:5 + nuhtc/utils/hooks/mean_teacher.py:8)."""

    step: jnp.ndarray
    student_params: Any
    teacher_params: Any
    opt_state: Any
    cum_samples: jnp.ndarray  # (num_stages, num_classes)


def lr_schedule(
    base_lr: float = 1e-4,
    warmup_iters: int = 1000,
    warmup_ratio: float = 1e-3,
    step_epochs=(30, 160),
    iters_per_epoch: int = 1000,
    gamma: float = 0.1,
):
    boundaries = [e * iters_per_epoch for e in step_epochs]

    def fn(step):
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * jnp.minimum(step / warmup_iters, 1.0))
        decay = jnp.ones(())
        for b in boundaries:
            decay = decay * jnp.where(step >= b, gamma, 1.0)
        return warm * decay

    return fn


def decay_mask(params) -> Any:
    """True = apply weight decay."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for k in flat:
        joined = "/".join(str(p) for p in k).lower()
        nd = (
            "relative_position_bias_table" in joined
            or "absolute_pos_embed" in joined
            or "norm" in joined
        )
        out[k] = not nd
    return traverse_util.unflatten_dict(out)


def frozen_mask(params, prefixes=("params/backbone/patch_embed", "params/backbone/patch_norm",
                                  "params/backbone/stage0_", "params/backbone/out_norm0",
                                  "params/backbone/downsample0")) -> Any:
    """True = frozen until the finetune iteration (Swin frozen_stages=1 —
    mmdet _freeze_stages freezes stages[0] INCLUDING its PatchMerging
    downsample)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for k in flat:
        joined = "/".join(str(p) for p in k)
        out[k] = any(joined.startswith(p) for p in prefixes)
    return traverse_util.unflatten_dict(out)


def create_optimizer(schedule, weight_decay: float = 0.05):
    return optax.inject_hyperparams(
        lambda lr: optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay,
                               mask=decay_mask)
    )(lr=schedule)


def create_train_state(model, params, num_stages: int = 3, num_classes: int = 5,
                       schedule=None, tx=None) -> Tuple[TrainState, Any]:
    schedule = schedule or lr_schedule()
    tx = tx if tx is not None else create_optimizer(schedule)
    opt_state = tx.init(params)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=jax.tree.map(lambda x: x, params),
            cum_samples=jnp.zeros((num_stages, num_classes), jnp.float32),
        ),
        tx,
    )


def make_train_step(model, tx, ema_momentum: float = 2e-4, finetune_iter: int = 15000,
                    weighter=None):
    """Returns train_step(state, batch, rng) → (state, metrics). jit/pjit-able.

    ``weighter``: optional ``(losses_dict, step) -> losses_dict`` applied
    inside the differentiated loss (the reference Weighter hook,
    nuhtc/utils/hooks/weight_adjust.py:7 — scheduled loss re-weighting)."""

    def loss_fn(params, batch, rng, cum_samples, step):
        losses, new_cum = model.apply(
            params,
            batch["img"],
            batch,
            cum_samples,
            deterministic=False,
            method="compute_losses",
            rngs={"sampling": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        if weighter is not None:
            losses = weighter(losses, step)
        return losses["total"], (losses, new_cum)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, (losses, new_cum)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.cum_samples, state.step
        )
        fmask = frozen_mask(state.params)
        frozen_now = lambda f: (state.step < finetune_iter) & f  # noqa: E731
        grads = jax.tree.map(
            lambda g, f: jnp.where(frozen_now(f), 0.0, g), grads, fmask
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # zeroing grads is not enough: AdamW's DECOUPLED weight decay adds
        # -lr*wd*param to the update regardless of the gradient, so frozen
        # params would still shrink ~exp(-lr*wd*steps) over the freeze window
        # (reference requires_grad=False params receive no update at all)
        updates = jax.tree.map(
            lambda u, f: jnp.where(frozen_now(f), 0.0, u), updates, fmask
        )
        params = optax.apply_updates(state.params, updates)
        m = ema_momentum
        ema = jax.tree.map(lambda e, p: (1 - m) * e + m * p, state.ema_params, params)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema,
            cum_samples=new_cum,
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def create_semi_train_state(model, params, num_stages: int = 1, num_classes: int = 5,
                            schedule=None, tx=None) -> Tuple[SemiTrainState, Any]:
    """Teacher starts as a clone of the student (reference MeanTeacher
    before_run: momentum_update(model, 0) at iter 0). ``tx`` overrides the
    default optimizer (e.g. a paramwise custom_keys named optimizer)."""
    schedule = schedule or lr_schedule()
    tx = tx or create_optimizer(schedule)
    opt_state = tx.init(params)
    return (
        SemiTrainState(
            step=jnp.zeros((), jnp.int32),
            student_params=params,
            teacher_params=jax.tree.map(lambda x: x, params),
            opt_state=opt_state,
            cum_samples=jnp.zeros((num_stages, num_classes), jnp.float32),
        ),
        tx,
    )


def make_semi_train_step(
    wrapper,
    tx,
    teacher_momentum: float = 0.999,
    teacher_warmup: int = 100,
    unsup_weight: float = 1.0,
    burn_in: int = 0,
    finetune_iter: int = 15000,
    weighter=None,
):
    """Semi-supervised train step over a MultiStreamDetector wrapper.

    Semantics follow the reference hooks (mean_teacher.py:37-65):
    per-iter teacher EMA with warmed-up momentum
    ``min(m, 1 - (1 + warmup)/(step + 1 + warmup))``; the unsupervised
    loss branch is weighted 0 during burn-in (steps < burn_in) so the
    teacher sees only supervised gradients early on.

    Batch keys: the supervised keys of ``compute_losses`` plus
    ``unsup_img`` (strong aug, student) and optionally
    ``unsup_img_teacher`` (weak aug, pseudo-label source — reference
    MultiBranch unsup_teacher/unsup_student split, base.py:180-186).
    """

    def loss_fn(student_params, teacher_params, batch, rng, cum_samples, uw, step):
        losses, new_cum = wrapper.semi_loss(
            student_params,
            teacher_params,
            batch,
            batch["unsup_img"],
            cum_samples,
            unsup_weight=uw,
            rngs={"sampling": rng, "dropout": jax.random.fold_in(rng, 1)},
            unsup_img_teacher=batch.get("unsup_img_teacher"),
            # reference Weighter hook — applied per-branch inside semi_loss
            # so schedule keys match and the burn-in/unsup_weight gating in
            # the combined total is preserved
            weighter=weighter,
            step=step,
        )
        return losses["total"], (losses, new_cum)

    def train_step(state: SemiTrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        uw = jnp.where(state.step < burn_in, 0.0, unsup_weight)
        (total, (losses, new_cum)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student_params, state.teacher_params, batch, rng,
            state.cum_samples, uw, state.step,
        )
        fmask = frozen_mask(state.student_params)
        frozen_now = lambda f: (state.step < finetune_iter) & f  # noqa: E731
        grads = jax.tree.map(
            lambda g, f: jnp.where(frozen_now(f), 0.0, g), grads, fmask
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.student_params)
        # decoupled weight decay must not touch frozen params (see
        # make_train_step)
        updates = jax.tree.map(
            lambda u, f: jnp.where(frozen_now(f), 0.0, u), updates, fmask
        )
        student = optax.apply_updates(state.student_params, updates)
        m = jnp.minimum(
            teacher_momentum,
            1.0 - (1.0 + teacher_warmup) / (state.step.astype(jnp.float32) + 1.0 + teacher_warmup),
        )
        teacher = jax.tree.map(
            lambda t, s: m * t + (1.0 - m) * s, state.teacher_params, student
        )
        new_state = SemiTrainState(
            step=state.step + 1,
            student_params=student,
            teacher_params=teacher,
            opt_state=opt_state,
            cum_samples=new_cum,
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["ema_momentum"] = m
        return new_state, metrics

    return train_step
