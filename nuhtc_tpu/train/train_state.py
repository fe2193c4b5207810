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
                                  "params/backbone/stage0_", "params/backbone/out_norm0")) -> Any:
    """True = frozen until the finetune iteration (Swin frozen_stages=1)."""
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
                       schedule=None) -> Tuple[TrainState, Any]:
    schedule = schedule or lr_schedule()
    tx = create_optimizer(schedule)
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


def make_train_step(model, tx, ema_momentum: float = 2e-4, finetune_iter: int = 15000):
    """Returns train_step(state, batch, rng) → (state, metrics). jit/pjit-able."""

    def loss_fn(params, batch, rng, cum_samples):
        losses, new_cum = model.apply(
            params,
            batch["img"],
            batch,
            cum_samples,
            deterministic=False,
            method="compute_losses",
            rngs={"sampling": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        return losses["total"], (losses, new_cum)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, (losses, new_cum)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.cum_samples
        )
        fmask = frozen_mask(state.params)
        grads = jax.tree.map(
            lambda g, f: jnp.where((state.step < finetune_iter) & f, 0.0, g),
            grads,
            fmask,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
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
