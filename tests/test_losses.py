import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nuhtc_tpu.models import losses as L


def test_smooth_l1():
    pred = jnp.asarray([0.0, 0.0, 0.0])
    tgt = jnp.asarray([0.05, 0.5, 2.0])
    got = np.asarray(L.smooth_l1(pred, tgt, beta=1.0))
    want = np.asarray([0.5 * 0.05**2, 0.5 * 0.25, 2.0 - 0.5])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sigmoid_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    logits = np.random.RandomState(0).randn(32).astype(np.float32) * 3
    targets = (np.random.RandomState(1).rand(32) > 0.5).astype(np.float32)
    got = np.asarray(L.sigmoid_ce(jnp.asarray(logits), jnp.asarray(targets)))
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_dice_loss_matches_reference_formula():
    import torch

    rng = np.random.RandomState(0)
    pred = rng.rand(4, 28, 28).astype(np.float32)
    tgt = (rng.rand(4, 28, 28) > 0.5).astype(np.float32)
    got = float(L.dice_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    # reference dice_loss (dice_loss.py:34-53), reduction mean, no weight
    p = torch.from_numpy(pred).flatten(1)
    t = torch.from_numpy(tgt).flatten(1)
    a = (p * t).sum(1)
    b = (p * p).sum(1) + 1e-3
    c = (t * t).sum(1) + 1e-3
    want = float((1 - 2 * a / (b + c)).mean())
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_loss_self_normalizing_weights():
    pred = jnp.ones((4, 8, 8)) * 0.5
    tgt = jnp.ones((4, 8, 8))
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    got = float(L.dice_loss(pred, tgt, weight=w))
    # weights normalized to sum 1 → weighted sum of per-sample losses
    per = float(L.dice_loss(pred[:1], tgt[:1]))
    assert got == pytest.approx(per, rel=1e-5)
    # all-zero weights → uniform ones (reference behavior)
    got0 = float(L.dice_loss(pred, tgt, weight=jnp.zeros(4)))
    assert got0 == pytest.approx(per * 4, rel=1e-4)  # ones, not normalized → sum?


def test_trunc_loss_regimes():
    # pt > gamma: -log(pt + eps); pt < gamma: smooth quadratic
    pred = jnp.asarray([[0.9, 0.1]])
    tgt = jnp.asarray([[1.0, 1.0]])
    got = np.asarray(L.trunc_loss(pred, tgt, gamma=0.3))
    lo = -math.log(0.9 + 1e-3)
    st = 0.5 - math.log(0.3) + (-(0.1**2)) / (2 * 0.3**2)
    want = (lo + st) / 2
    assert got[0] == pytest.approx(want, rel=1e-4)


def test_seesaw_loss_background_and_positive():
    c = 3
    cls_score = jnp.asarray(
        [
            [2.0, 0.0, 0.0, 1.0, -1.0],  # positive, class 0
            [0.0, 0.0, 0.0, -1.0, 1.0],  # background
        ]
    )
    labels = jnp.asarray([0, 3])  # 3 == num_classes == background
    weights = jnp.ones(2)
    cum = jnp.zeros(c)
    loss_cls, loss_obj, new_cum = L.seesaw_loss(cls_score, labels, weights, cum)
    assert np.isfinite(float(loss_cls)) and np.isfinite(float(loss_obj))
    # cum_samples counts only positives
    np.testing.assert_allclose(np.asarray(new_cum), [1.0, 0.0, 0.0])
    # objectness: CE of [1,-1] vs pos(0) and [-1,1] vs neg(1), averaged
    import torch
    import torch.nn.functional as F

    obj = torch.tensor([[1.0, -1.0], [-1.0, 1.0]])
    want_obj = float(F.cross_entropy(obj, torch.tensor([0, 1])))
    assert float(loss_obj) == pytest.approx(want_obj, rel=1e-3)
    # positive-sample class loss: classes with zero counts are clamped to 1
    # (mmdet semantics) — plain CE over the class logits
    import torch.nn.functional as F2

    # normalized by TOTAL samples (mmdet avg_factor), 1 positive of 2
    want_cls = float(F2.cross_entropy(torch.tensor([[2.0, 0.0, 0.0]]), torch.tensor([0]))) / 2
    assert float(loss_cls) == pytest.approx(want_cls, rel=1e-3)


def test_seesaw_mitigation_direction():
    """For a rare-class sample, penalties from frequent classes are kept but
    a frequent-class sample's rare-class logits get down-weighted."""
    cum = jnp.asarray([99.0, 1.0])  # class 0 frequent, class 1 rare
    logits = jnp.asarray([[0.0, 0.0]])
    labels = jnp.asarray([0])  # frequent-class sample
    per, _ = L.seesaw_ce(logits, labels, jnp.ones(1), cum, p=0.8, q=0.0)
    # rare-class competitor logit gets + log((1/100)^0.8) → loss below plain CE
    plain = float(L.softmax_ce(logits, labels)[0])
    assert float(per[0]) < plain
    # and the reverse direction is NOT mitigated
    per2, _ = L.seesaw_ce(logits, jnp.asarray([1]), jnp.ones(1), jnp.asarray([99.0, 0.0]), p=0.8, q=0.0)
    plain2 = float(L.softmax_ce(logits, jnp.asarray([1]))[0])
    assert float(per2[0]) == pytest.approx(plain2, rel=1e-5)


def test_weight_mse_exp():
    pred = jnp.asarray([0.5, 0.5])
    tgt = jnp.asarray([1.0, 0.0])
    wm = L.WeightMSELoss()
    got = float(wm(pred, tgt))
    # weights: (2-eps)*t+eps → [1.99, 0.01]; mean = sum(w*(p-t)^2)/sum(w)
    w = np.asarray([1.99, 0.01])
    want = float((w * 0.25).sum() / w.sum())
    assert got == pytest.approx(want, rel=1e-5)
