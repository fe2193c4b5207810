"""Additional RoI samplers (reference nuhtc/datasets/samplers/):

- ``instance_balanced_sample``: positives spread evenly across GT instances
  (InstanceBalancedPosSampler_Cus);
- ``ohem_sample``: hardest negatives by loss (OHEMSampler_HTC) — takes
  per-candidate classification losses instead of random keys;
- ``semi_balance_indices``: the DistributedGroupSemiBalanceSampler analog for
  sup/unsup dataset mixing (host-side index generator).

All device functions are static-shape like train.targets.random_sample.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nuhtc_tpu.train.targets import AssignResult, SampleResult


def instance_balanced_sample(
    key: jax.Array,
    assign: AssignResult,
    num: int,
    pos_fraction: float,
    num_classes: int,
    num_gts: int,
) -> SampleResult:
    """Positive slots allocated round-robin over GT instances, then random."""
    n = assign.gt_inds.shape[0]
    num_pos_expected = int(num * pos_fraction)
    pos_mask = assign.gt_inds > 0
    neg_mask = assign.gt_inds == 0

    kp, kn = jax.random.split(key)
    rp = jax.random.uniform(kp, (n,))
    rn = jax.random.uniform(kn, (n,))

    # rank positives WITHIN their gt group (global group-major sorted rank
    # minus the group's start offset), then interleave groups round-robin:
    # priority = within_gt_rank * num_gts + gt_idx — every gt contributes its
    # first candidate before any gt contributes its second
    g_eff = max(num_gts, 1)
    grp = jnp.clip(assign.gt_inds - 1, 0, g_eff - 1)
    keys = jnp.where(pos_mask, grp.astype(jnp.float32) * 10.0 + rp, jnp.inf)
    order = jnp.argsort(keys)
    sorted_rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    counts = jnp.sum(
        jnp.where(pos_mask[:, None], jax.nn.one_hot(grp, g_eff, dtype=jnp.int32), 0),
        axis=0,
    )  # (G,) positives per gt
    offsets = jnp.cumsum(counts) - counts  # group start in the sorted order
    within = sorted_rank - offsets[grp]
    prio_pos = jnp.where(
        pos_mask, (within * g_eff + grp).astype(jnp.float32), 1e9
    )
    rank_pos = jnp.zeros((n,), jnp.int32).at[jnp.argsort(prio_pos)].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    big = jnp.float32(1e9)
    prio = jnp.where(pos_mask & (rank_pos < num_pos_expected), rank_pos.astype(jnp.float32), big)
    rank_neg = jnp.zeros((n,), jnp.int32).at[jnp.argsort(jnp.where(neg_mask, rn, jnp.inf))].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    prio = jnp.where(neg_mask & (rank_neg < num), 1e6 + rank_neg.astype(jnp.float32), prio)
    if n < num:
        prio = jnp.pad(prio, (0, num - n), constant_values=big)
    neg_prio, idx = jax.lax.top_k(-prio, num)
    idx = jnp.minimum(idx, n - 1)
    sel = -neg_prio
    valid = sel < big
    is_pos = valid & (sel < 1e6)
    gt_inds = jnp.where(is_pos, assign.gt_inds[idx] - 1, 0)
    labels = jnp.where(is_pos, assign.labels[idx], num_classes)
    labels = jnp.where(valid, labels, num_classes)
    return SampleResult(idx, is_pos, valid, gt_inds.astype(jnp.int32), labels.astype(jnp.int32))


def ohem_sample(
    losses: jnp.ndarray,  # (N,) per-candidate current cls loss
    assign: AssignResult,
    num: int,
    pos_fraction: float,
    num_classes: int,
) -> SampleResult:
    """Online hard example mining: hardest negatives by loss, random→hard pos."""
    n = assign.gt_inds.shape[0]
    num_pos_expected = int(num * pos_fraction)
    pos_mask = assign.gt_inds > 0
    neg_mask = assign.gt_inds == 0

    def rank_by(mask, score):  # high score → low rank
        keys = jnp.where(mask, -score, jnp.inf)
        order = jnp.argsort(keys)
        return jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    pos_rank = rank_by(pos_mask, losses)
    neg_rank = rank_by(neg_mask, losses)
    big = jnp.float32(1e9)
    prio = jnp.where(pos_mask & (pos_rank < num_pos_expected), pos_rank.astype(jnp.float32), big)
    prio = jnp.where(neg_mask & (neg_rank < num), 1e6 + neg_rank.astype(jnp.float32), prio)
    if n < num:
        prio = jnp.pad(prio, (0, num - n), constant_values=big)
    neg_prio, idx = jax.lax.top_k(-prio, num)
    idx = jnp.minimum(idx, n - 1)
    sel = -neg_prio
    valid = sel < big
    is_pos = valid & (sel < 1e6)
    gt_inds = jnp.where(is_pos, assign.gt_inds[idx] - 1, 0)
    labels = jnp.where(is_pos, assign.labels[idx], num_classes)
    labels = jnp.where(valid, labels, num_classes)
    return SampleResult(idx, is_pos, valid, gt_inds.astype(jnp.int32), labels.astype(jnp.int32))


def semi_balance_indices(
    n_sup: int, n_unsup: int, batch_size: int, sup_ratio: float = 0.5, seed: int = 0
) -> Iterator[Sequence[int]]:
    """Host-side batch index generator mixing supervised (0..n_sup) and
    unsupervised (n_sup..n_sup+n_unsup) samples at a fixed ratio per batch."""
    rng = np.random.RandomState(seed)
    n_s = max(int(round(batch_size * sup_ratio)), 1)
    n_u = batch_size - n_s
    while True:
        sup = rng.randint(0, n_sup, n_s)
        unsup = n_sup + rng.randint(0, max(n_unsup, 1), n_u) if n_unsup else rng.randint(0, n_sup, n_u)
        yield np.concatenate([sup, unsup]).tolist()
