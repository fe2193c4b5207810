"""Parity test: fused Pallas window-attention (interpret mode on CPU) vs the
XLA WindowAttention module, shifted and non-shifted.

Interpret-mode pallas is minutes-slow on the 1-core CI host, so this suite is
opt-in (NUHTC_SLOW_PALLAS=1). The same comparison runs natively on the TPU
via tools/analysis_tools/probe_fused_attention.py (block-level fused vs XLA,
max rel diff ~0.07 = bf16 reordering)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nuhtc_tpu.models.swin import (
    WindowAttention,
    _rel_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)
from nuhtc_tpu.ops.window_attention_pallas import window_attention_fused

slow = pytest.mark.skipif(
    os.environ.get("NUHTC_SLOW_PALLAS") != "1",
    reason="pallas interpret mode is minutes-slow on the 1-core host "
    "(the single-window case below always runs; full shapes are opt-in)",
)

WS, H, W, C, NH, B = 7, 14, 21, 32, 2, 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    wa = WindowAttention(dim=C, num_heads=NH, window_size=WS, dtype=jnp.bfloat16)
    wins = window_partition(x, WS)
    p = wa.init(jax.random.PRNGKey(0), wins)
    return x, wa, p


def _fused(x, p, shift):
    params = p["params"]
    table = params["relative_position_bias_table"]
    idx = _rel_position_index(WS)
    bias49 = table[idx.reshape(-1)].reshape(WS * WS, WS * WS, NH).transpose(2, 0, 1)
    return window_attention_fused(
        x,
        params["qkv"]["kernel"],
        params["qkv"]["bias"],
        params["proj"]["kernel"],
        params["proj"]["bias"],
        bias49,
        ws=WS,
        num_heads=NH,
        shift=shift,
        interpret=True,
    )


@slow
def test_fused_matches_xla_noshift(setup):
    x, wa, p = setup
    wins = window_partition(x, WS)
    want = window_reverse(wa.apply(p, wins), WS, H, W)
    got = _fused(x, p, shift=0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.06
    )


@slow
def test_fused_matches_xla_shifted(setup):
    x, wa, p = setup
    shift = WS // 2
    xr = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    mask = jnp.asarray(_shift_attn_mask(H, W, WS, shift))
    wins = window_partition(xr, WS)
    want = window_reverse(wa.apply(p, wins, mask=mask), WS, H, W)
    got = _fused(xr, p, shift=shift)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.06
    )


def test_fused_tiny_single_window():
    """Always-on CI coverage for the fused kernel: one 7x7 window, one
    batch, one head — small enough for interpret mode in seconds."""
    ws = 7
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, ws, ws, 32).astype(np.float32)).astype(jnp.bfloat16)
    wa = WindowAttention(dim=32, num_heads=1, window_size=ws, dtype=jnp.bfloat16)
    wins = window_partition(x, ws)
    p = wa.init(jax.random.PRNGKey(0), wins)
    params = p["params"]
    table = params["relative_position_bias_table"]
    idx = _rel_position_index(ws)
    bias49 = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, 1).transpose(2, 0, 1)
    want = window_reverse(wa.apply(p, wins), ws, ws, ws)
    got = window_attention_fused(
        x,
        params["qkv"]["kernel"],
        params["qkv"]["bias"],
        params["proj"]["kernel"],
        params["proj"]["bias"],
        bias49,
        ws=ws,
        num_heads=1,
        shift=0,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.06
    )


@pytest.mark.parametrize("shift", [False, True])
def test_block_fused_tiny(shift):
    """Always-on CI coverage for the fused FULL-BLOCK kernel (attention +
    residual + LN2 + MLP + residual) vs the XLA SwinBlock, including
    padding (6x7 -> 8x8) and the shifted variant. ws=4 keeps interpret
    mode in seconds."""
    from nuhtc_tpu.models.swin import SwinBlock
    from nuhtc_tpu.ops.window_attention_pallas import window_block_fused

    ws, c, nh = 4, 16, 2
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 6, 7, c).astype(np.float32) * 0.5)
    blk = SwinBlock(
        dim=c, num_heads=nh, window_size=ws, shift=shift,
        fused_attention=False, dtype=jnp.float32,
    )
    p = blk.init(jax.random.PRNGKey(1), x, True)
    want = blk.apply(p, x, True)

    prm = p["params"]
    n1 = prm["norm1"]
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h1 = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * n1["scale"] + n1["bias"]

    s = ws // 2 if shift else 0
    pad = ((0, 0), (0, 2), (0, 1), (0, 0))
    xp, h1p = jnp.pad(x, pad), jnp.pad(h1, pad)
    if s:
        xp = jnp.roll(xp, (-s, -s), axis=(1, 2))
        h1p = jnp.roll(h1p, (-s, -s), axis=(1, 2))

    attn = prm["attn"]
    table = attn["relative_position_bias_table"]
    idx = _rel_position_index(ws)
    bias49 = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, nh).transpose(2, 0, 1)
    out = window_block_fused(
        xp, h1p,
        attn["qkv"]["kernel"], attn["qkv"]["bias"],
        attn["proj"]["kernel"], attn["proj"]["bias"], bias49,
        prm["norm2"]["scale"], prm["norm2"]["bias"],
        prm["ffn"]["fc1"]["kernel"], prm["ffn"]["fc1"]["bias"],
        prm["ffn"]["fc2"]["kernel"], prm["ffn"]["fc2"]["bias"],
        ws=ws, num_heads=nh, shift=s, interpret=True,
    )
    if s:
        out = jnp.roll(out, (s, s), axis=(1, 2))
    got = out[:, :6, :7, :]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.06
    )
