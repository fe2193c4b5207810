"""Parity of the fused depth-to-space mask tail (NUHTC_MASK_TAIL=d2s) vs the
reference ConvTranspose lowering.

The 2×2 stride-2 VALID deconv has non-overlapping taps, so the d2s path is
the same linear map — identical params (tied module layout), identical
logits up to matmul accumulation order. Reference semantics:
fcn_mask_head.py:179-344 (deconv upsample + 1×1 logits)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuhtc_tpu.models.mask_head import HTCMaskHead


def _logits(mode: str, params, x, head):
    os.environ["NUHTC_MASK_TAIL"] = mode
    try:
        return head.apply(
            params, x, res_feat=None, return_logits=True, return_feat=False
        )
    finally:
        os.environ.pop("NUHTC_MASK_TAIL", None)


@pytest.mark.parametrize("class_agnostic", [True, False])
def test_d2s_tail_matches_deconv(class_agnostic):
    head = HTCMaskHead(
        num_convs=4, in_channels=64, conv_out_channels=64, num_classes=5,
        class_agnostic=class_agnostic, dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 14, 14, 64).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        params = head.init(jax.random.PRNGKey(0), x, res_feat=None)
        a = _logits("deconv", params, x, head)
        b = _logits("d2s", params, x, head)
    assert a.shape == b.shape == (6, 28, 28, 1 if class_agnostic else 5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


def test_d2s_param_layout_identical():
    """Both modes must create the same param pytree (checkpoint interop)."""
    head = HTCMaskHead(dtype=jnp.float32)
    x = jnp.zeros((2, 14, 14, 64), jnp.float32)

    def tree_spec(mode):
        os.environ["NUHTC_MASK_TAIL"] = mode
        try:
            p = head.init(jax.random.PRNGKey(0), x, res_feat=None)
        finally:
            os.environ.pop("NUHTC_MASK_TAIL", None)
        return jax.tree.map(lambda v: (v.shape, v.dtype), p)

    a, b = tree_spec("deconv"), tree_spec("d2s")
    assert jax.tree.structure(a) == jax.tree.structure(b)
    assert jax.tree.leaves(a) == jax.tree.leaves(b)


def test_d2s_param_init_values_identical():
    """Same RNG path → same init values (fresh training equivalence)."""
    head = HTCMaskHead(dtype=jnp.float32)
    x = jnp.zeros((2, 14, 14, 64), jnp.float32)
    ps = []
    for mode in ("deconv", "d2s"):
        os.environ["NUHTC_MASK_TAIL"] = mode
        try:
            ps.append(head.init(jax.random.PRNGKey(7), x, res_feat=None))
        finally:
            os.environ.pop("NUHTC_MASK_TAIL", None)
    for va, vb in zip(jax.tree.leaves(ps[0]), jax.tree.leaves(ps[1])):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
