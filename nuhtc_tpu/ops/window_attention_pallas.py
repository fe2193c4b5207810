"""Fused window-attention Pallas TPU kernel (Swin inference hot path).

The XLA lowering of a Swin block's attention makes ~15 HBM passes over the
(B, H, W, C) tensor (partition/reverse copies, qkv reshape relayouts, attn
logits round-trips, softmax, proj — measured 182 device ops / 17.8 ms for the
two stage-0 blocks at B16·512² on v5e). This kernel fuses
window-partition → qkv → relative-bias + shift-mask attention → proj →
window-reverse into ONE pass: each grid step loads a 7-row window band, does
everything in VMEM, writes the band back.

Key trick: a window-row band of shape (ws, Wp, C) is attention-equivalent to
a single (T=ws·Wp) token sequence with BLOCK-DIAGONAL attention — token j
belongs to window (j mod Wp) // ws. All windows of the band are processed by
ONE (T, T) masked matmul per head: the off-window penalty, the shifted-window
column penalty, and the last-band row penalty are all static (T, T) tables.
The learned 49×49 relative bias is expanded to the band ONCE per call in XLA
(P @ b49 @ Pᵀ — no gathers), merged with the static penalties, and handed to
the kernel as a (nh, T, T) bf16 table that stays VMEM-resident across grid
steps (constant index_map) — the in-kernel per-step expansion it replaces
cost two matmuls per head per grid step.

Matches WindowAttention math exactly up to bf16 rounding (additive -100
shift mask like the reference, softmax in f32). Inference only — the XLA
path remains for training/CPU.

Reference behavior: mmdet SwinTransformer window attention
(thirdparty/mmdetection/mmdet/models/backbones/swin.py:465 WindowMSA/ShiftWindowMSA).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e9  # off-window pairs (artifact of band batching) — hard mask
SHIFT_PEN = -100.0  # reference shift-mask additive value (swin.py _shift_attn_mask)


@lru_cache(maxsize=32)
def _static_tables(ws: int, wp: int, hp: int, shift: int):
    """Host-side constants for a band: one-hot window-position matrix P
    (T, ws²), the static penalty (off-window + shifted column regions) and
    the last-band row penalty."""
    t = ws * wp
    ri = np.arange(t) // wp  # local row in band (0..ws-1)
    ci = np.arange(t) % wp  # column in padded row
    pos = ri * ws + (ci % ws)  # position within the window (0..48)
    p = np.zeros((t, ws * ws), np.float32)
    p[np.arange(t), pos] = 1.0

    win = ci // ws
    pen = np.where(win[:, None] != win[None, :], NEG, 0.0)

    if shift:
        # column regions of the rolled frame: [0, wp-ws), [wp-ws, wp-shift), rest
        cid = (ci >= wp - ws).astype(np.int32) + (ci >= wp - shift)
        pen = pen + np.where(cid[:, None] != cid[None, :], SHIFT_PEN, 0.0)
        # row regions apply only to the last band (rows hp-ws .. hp-1)
        rid = (ri >= 0).astype(np.int32) + (ri >= ws - shift)
        rowpen = np.where(rid[:, None] != rid[None, :], SHIFT_PEN, 0.0)
    else:
        rowpen = np.zeros((t, t))
    return (
        p.astype(np.float32),
        pen.astype(np.float32),
        rowpen.astype(np.float32),
    )


def _make_kernel(ws, wp, c, nh, nb, shift, qk_scale=None):
    t = ws * wp
    hd = c // nh
    scale = qk_scale if qk_scale is not None else hd**-0.5

    def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
               bias_ref, rowpen_ref, o_ref):
        band = pl.program_id(1)
        x = x_ref[0, 0]  # (T, C) bf16
        qkv = (
            jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
            + bqkv_ref[...]
        )  # (T, 3C) f32

        rp = None
        if shift:
            rp = rowpen_ref[0].astype(jnp.float32) * (band == nb - 1).astype(
                jnp.float32
            )

        outs = []
        for h in range(nh):
            q = qkv[:, h * hd : (h + 1) * hd] * scale
            k = qkv[:, c + h * hd : c + (h + 1) * hd]
            v = qkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            attn = jax.lax.dot_general(
                q.astype(jnp.bfloat16),
                k.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, T)
            # bias_ref holds the pre-expanded P @ b49 @ Pᵀ + static penalties
            # (loop-invariant — expanded ONCE per call in XLA, resident in
            # VMEM across grid steps via the constant index_map; the old
            # in-kernel expansion cost two matmuls per head per step)
            attn = attn + bias_ref[h].astype(jnp.float32)
            if shift:
                attn = attn + rp
            m = jnp.max(attn, axis=1, keepdims=True)
            e = jnp.exp(attn - m)
            s = jnp.sum(e, axis=1, keepdims=True)
            pr = (e / s).astype(jnp.bfloat16)
            outs.append(
                jnp.dot(pr, v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            )
        o = jnp.concatenate(outs, axis=1)  # (T, C) f32
        o = jnp.dot(o.astype(jnp.bfloat16), wproj_ref[...], preferred_element_type=jnp.float32)
        o = o + bproj_ref[...]
        o_ref[0, 0] = o.astype(o_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("ws", "num_heads", "shift", "qk_scale", "interpret"))
def window_attention_fused(
    xp: jnp.ndarray,  # (B, Hp, Wp, C) — padded (and pre-rolled if shifted)
    wqkv: jnp.ndarray,  # (C, 3C)
    bqkv: jnp.ndarray,  # (3C,)
    wproj: jnp.ndarray,  # (C, C)
    bproj: jnp.ndarray,  # (C,)
    bias49: jnp.ndarray,  # (nh, ws², ws²) learned relative bias
    ws: int,
    num_heads: int,
    shift: int,
    qk_scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused windowed MSA over the padded feature map. Returns (B, Hp, Wp, C)."""
    b, hp, wp, c = xp.shape
    assert hp % ws == 0 and wp % ws == 0, (hp, wp, ws)
    nb = hp // ws
    t = ws * wp
    p_np, pen_np, rowpen_np = _static_tables(ws, wp, hp, shift)

    dtype = xp.dtype
    x2 = xp.reshape(b, nb, t, c)
    kern = _make_kernel(ws, wp, c, num_heads, nb, shift, qk_scale)

    # expand the learned 49×49 bias to the band ONCE in XLA (P @ b49 @ Pᵀ),
    # fold in the static off-window/shift penalties, and hand the kernel the
    # merged (nh, T, T) bf16 table — resident in VMEM across grid steps
    p = jnp.asarray(p_np)  # (T, 49)
    bias_full = jnp.einsum(
        "tk,hks,ms->htm", p, bias49.astype(jnp.float32), p,
        precision=jax.lax.Precision.HIGHEST,
    )
    bias_full = (bias_full + jnp.asarray(pen_np)[None]).astype(jnp.bfloat16)

    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((num_heads, t, t), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, t, t), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, t, c), dtype),
        interpret=interpret,
    )(
        x2.astype(jnp.bfloat16),
        wqkv.astype(jnp.bfloat16),
        bqkv.astype(jnp.float32).reshape(1, -1),
        wproj.astype(jnp.bfloat16),
        bproj.astype(jnp.float32).reshape(1, -1),
        bias_full,
        jnp.asarray(rowpen_np).astype(jnp.bfloat16)[None],
    )
    return out.reshape(b, hp, wp, c)


def _make_block_kernel(ws, wp, c, nh, hidden, qk_scale=None):
    """Full Swin block tail: attention on the pre-normed band + residual +
    LN2 + tanh-approx-gelu MLP (Mosaic has no erf lowering; <3e-3 abs vs
    exact — below bf16 resolution of the fc2 input) + residual — one VMEM
    pass (the XLA lowering round-trips the (B, Hp, Wp, C) map through HBM
    between each of those ops)."""
    t = ws * wp
    hd = c // nh
    scale = qk_scale if qk_scale is not None else hd**-0.5

    def kernel(x_ref, h1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
               g2_ref, be2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
               bias_ref, o_ref):
        h1 = h1_ref[0, 0]  # (T, C) bf16 — post-LN1, padded/rolled
        qkv = (
            jnp.dot(h1, wqkv_ref[...], preferred_element_type=jnp.float32)
            + bqkv_ref[...]
        )

        outs = []
        for h in range(nh):
            q = qkv[:, h * hd : (h + 1) * hd] * scale
            k = qkv[:, c + h * hd : c + (h + 1) * hd]
            v = qkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            attn = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            # bias_ref block: the index_map already selected the plain table
            # or the +rowpen variant for the last band (no in-kernel select,
            # no separate rowpen table in VMEM)
            attn = attn + bias_ref[0, h].astype(jnp.float32)
            m = jnp.max(attn, axis=1, keepdims=True)
            e = jnp.exp(attn - m)
            s = jnp.sum(e, axis=1, keepdims=True)
            pr = (e / s).astype(jnp.bfloat16)
            outs.append(
                jnp.dot(pr, v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            )
        o = jnp.concatenate(outs, axis=1)
        o = jnp.dot(o.astype(jnp.bfloat16), wproj_ref[...], preferred_element_type=jnp.float32)
        o = o + bproj_ref[...]

        x2 = x_ref[0, 0].astype(jnp.float32) + o  # residual (raw shortcut)

        # LN2 (f32 stats over C) + MLP with tanh-approx gelu
        mu = jnp.mean(x2, axis=1, keepdims=True)
        var = jnp.mean((x2 - mu) * (x2 - mu), axis=1, keepdims=True)
        h2 = (x2 - mu) * jax.lax.rsqrt(var + 1e-5) * g2_ref[...] + be2_ref[...]
        u = (
            jnp.dot(h2.astype(jnp.bfloat16), wfc1_ref[...], preferred_element_type=jnp.float32)
            + bfc1_ref[...]
        )
        # tanh-approx gelu: Mosaic has no erf lowering; vs exact gelu the
        # difference (<3e-3 abs) is below bf16 resolution of the fc2 input
        u = 0.5 * u * (1.0 + jnp.tanh(0.7978845608028654 * (u + 0.044715 * u * u * u)))
        y = (
            jnp.dot(u.astype(jnp.bfloat16), wfc2_ref[...], preferred_element_type=jnp.float32)
            + bfc2_ref[...]
        )
        o_ref[0, 0] = (x2 + y).astype(o_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("ws", "num_heads", "shift", "qk_scale", "interpret"))
def window_block_fused(
    xp: jnp.ndarray,  # (B, Hp, Wp, C) RAW shortcut — padded (+ rolled if shifted)
    h1p: jnp.ndarray,  # (B, Hp, Wp, C) post-LN1 map, same padding/roll
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    bias49: jnp.ndarray,  # (nh, ws², ws²)
    g2: jnp.ndarray,  # (C,) LN2 scale
    b2: jnp.ndarray,  # (C,) LN2 bias
    wfc1: jnp.ndarray,  # (C, hidden)
    bfc1: jnp.ndarray,
    wfc2: jnp.ndarray,  # (hidden, C)
    bfc2: jnp.ndarray,
    ws: int,
    num_heads: int,
    shift: int,
    qk_scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention + residual + LN2 + MLP + residual over the padded map.
    Returns (B, Hp, Wp, C) = the full SwinBlock output in the padded/rolled
    frame (caller unrolls + crops). Semantics match the XLA path: LN1 and the
    pad/roll stay outside, so pad tokens enter attention exactly as there."""
    b, hp, wp, c = xp.shape
    assert hp % ws == 0 and wp % ws == 0, (hp, wp, ws)
    nb = hp // ws
    t = ws * wp
    hidden = wfc1.shape[1]
    p_np, pen_np, rowpen_np = _static_tables(ws, wp, hp, shift)

    dtype = xp.dtype
    x2d = xp.reshape(b, nb, t, c)
    h2d = h1p.reshape(b, nb, t, c)
    kern = _make_block_kernel(ws, wp, c, num_heads, hidden, qk_scale)

    p = jnp.asarray(p_np)
    bias_full = jnp.einsum(
        "tk,hks,ms->htm", p, bias49.astype(jnp.float32), p,
        precision=jax.lax.Precision.HIGHEST,
    )
    bias_full = (bias_full + jnp.asarray(pen_np)[None]).astype(jnp.bfloat16)

    # last shifted band gets its own pre-merged (bias + rowpen) table; the
    # BlockSpec index_map selects variant 0 or 1 per band, so the kernel
    # holds ONE (nh, T, T) table in VMEM and does no per-step select
    if shift:
        bias_both = jnp.stack(
            [bias_full, bias_full + jnp.asarray(rowpen_np).astype(jnp.bfloat16)[None]]
        )  # (2, nh, T, T)
    else:
        bias_both = bias_full[None]  # (1, nh, T, T)
    last = nb - 1

    def bias_index(i, j):
        if shift:
            return (jnp.where(j == last, 1, 0), 0, 0, 0)
        return (0, 0, 0, 0)

    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, hidden), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0)),
            pl.BlockSpec((hidden, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, num_heads, t, t), bias_index),
        ],
        out_specs=pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, t, c), dtype),
        interpret=interpret,
    )(
        x2d.astype(jnp.bfloat16),
        h2d.astype(jnp.bfloat16),
        wqkv.astype(jnp.bfloat16),
        row(bqkv),
        wproj.astype(jnp.bfloat16),
        row(bproj),
        row(g2),
        row(b2),
        wfc1.astype(jnp.bfloat16),
        row(bfc1),
        wfc2.astype(jnp.bfloat16),
        row(bfc2),
        bias_both,
    )
    return out.reshape(b, hp, wp, c)
