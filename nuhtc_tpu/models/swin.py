"""Swin Transformer backbone (NHWC, flax) — Swin-T config for NuHTC.

Re-implements the behavior of the mmdet SwinTransformer consumed by the
reference (thirdparty/mmdetection/mmdet/models/backbones/swin.py:465; config
configs/nuhtc/htc_lite_swin_pytorch_fpn_PanNuke_seasaw_CAS.py:31-48):
embed 96, depths [2,2,6,2], heads [3,6,12,24], window 7, 4-level outputs with
per-level LayerNorms, PatchMerging downsampling with mmdet's unfold channel
ordering (so torch checkpoints convert 1:1).

TPU notes: everything is NHWC; window partition is pure reshape/transpose;
shifted windows use jnp.roll + a precomputed additive attention mask; all
shapes static.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import BACKBONES
from nuhtc_tpu.models.layers import MLP, drop_path, DenseParams as _DenseParams

Dtype = Any


def _rel_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, n, n
    rel = rel.transpose(1, 2, 0)  # n, n, 2
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True, fused_map=None,
                 shift: int = 0, return_params: bool = False):
        """x: (num_windows*B, N, C); mask: (nW, N, N) additive or None.

        ``fused_map``: alternative input — the padded (and pre-rolled, if
        shifted) feature map (B, Hp, Wp, C); attention then runs through the
        fused Pallas band kernel (inference hot path) and returns the same
        layout. ``x`` is ignored in that case.

        ``return_params``: returns (wqkv, bqkv, wproj, bproj, bias49) so the
        caller can drive the fused full-block kernel (SwinBlock)."""
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        wqkv, bqkv = _DenseParams(self.dim, self.dim * 3, self.qkv_bias, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, True, name="proj")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        index = _rel_position_index(ws)
        n = ws * ws

        if return_params:
            bias49 = table[index.reshape(-1)].reshape(n, n, self.num_heads)
            if bqkv is None:
                bqkv = jnp.zeros((self.dim * 3,), jnp.float32)
            return wqkv, bqkv, wproj, bproj, bias49.transpose(2, 0, 1)

        if fused_map is not None:
            from nuhtc_tpu.ops.window_attention_pallas import window_attention_fused

            bias49 = table[index.reshape(-1)].reshape(n, n, self.num_heads)
            bias49 = bias49.transpose(2, 0, 1)  # (nh, 49, 49)
            if bqkv is None:
                bqkv = jnp.zeros((self.dim * 3,), jnp.float32)
            return window_attention_fused(
                fused_map, wqkv, bqkv, wproj, bproj, bias49,
                ws=ws, num_heads=self.num_heads, shift=shift,
                qk_scale=self.qk_scale,
            )

        b, n, c = x.shape
        dt = self.dtype
        qkv = jnp.dot(x.astype(dt), wqkv.astype(dt))
        if bqkv is not None:
            qkv = qkv + bqkv.astype(dt)
        # contiguous last-axis splits (torch qkv weight order: q|k|v), head
        # split via reshape only — no 5-d transpose materialization
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)

        bias = table[index.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (nh, n, n)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = jnp.dot(out.astype(dt), wproj.astype(dt)) + bproj.astype(dt)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class _LNParams(nn.Module):
    """scale/bias holder aliasing an nn.LayerNorm param tree (same names)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _FFNParams(nn.Module):
    """fc1/fc2 holder aliasing the MLP param tree (layers.MLP names)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return w1, b1, w2, b2


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B*nH*nW, ws*ws, C). H, W must be multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(wins: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = wins.shape[0] // (h // ws * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Additive attention mask (nW, ws², ws²) for shifted windows."""
    img_mask = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wss] = cnt
            cnt += 1
    m = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, :, None] != m[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fused_attention: bool = True  # Pallas band kernel on TPU inference
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad_b = (-h) % ws
        pad_r = (-w) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        shift = ws // 2 if self.shift else 0
        if shift:
            xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))

        attn_mod = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=ws,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop_rate,
            proj_drop=self.drop_rate,
            dtype=self.dtype,
            name="attn",
        )
        # band kernel beats XLA only on large spatial extents (stage 0/1);
        # at 32² and below the attention-only kernel lost (measured round 2).
        # NUHTC_SWIN_KERNEL_MIN_HW lets perf probes re-test the cutoff for
        # the full-block kernel, whose economics differ (it also saves the
        # LN2/MLP HBM round-trips).
        # default 256 = 16² (round 5): extending the full-block kernel to
        # stages 2 (32²) and 3 (16²) won whole-model — 114.3 → 116.2 tiles/s
        # vs the round-3 cutoff 64² (the attention-only kernel had lost at
        # ≤32²; the full-block kernel's folded LN2/MLP round-trips flip it)
        min_hw = int(os.environ.get("NUHTC_SWIN_KERNEL_MIN_HW", 256))
        eligible = (
            self.fused_attention
            and deterministic
            and self.dtype == jnp.bfloat16
            and jax.default_backend() != "cpu"
            and h * w >= min_hw
        )
        # NUHTC_SWIN_KERNEL selects the Pallas kernel tier (read at trace
        # time): "block" = fused full block (attention+LN2+MLP — default:
        # TPU-parity-validated at production shapes for all four stage-0/1
        # variants, max_abs <=0.024 on ~0.96-scale outputs, commit 05c0bd1),
        # "attn" = attention-only band kernel, "none" = pure XLA.
        mode = os.environ.get("NUHTC_SWIN_KERNEL", "block")
        if eligible and mode == "block":
            # full-block Pallas kernel: attention + residual + LN2 + MLP +
            # residual in one VMEM pass (LN1 + pad/roll stay here so pad
            # tokens enter attention exactly as on the XLA path). Inference
            # only — drop_path is identity and dropout is off.
            from nuhtc_tpu.ops.window_attention_pallas import window_block_fused

            wqkv, bqkv, wproj, bproj, bias49 = attn_mod(None, return_params=True)
            g2, be2 = _LNParams(self.dim, name="norm2")()
            w1, b1_, w2, b2_ = _FFNParams(
                self.dim, int(self.dim * self.mlp_ratio), name="ffn"
            )()
            sc = jnp.pad(shortcut, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            if shift:
                sc = jnp.roll(sc, (-shift, -shift), axis=(1, 2))
            out = window_block_fused(
                sc, xp, wqkv, bqkv, wproj, bproj, bias49,
                g2, be2, w1, b1_, w2, b2_,
                ws=ws, num_heads=self.num_heads, shift=shift,
                qk_scale=attn_mod.qk_scale,
            )
            if shift:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
            return out[:, :h, :w, :]

        if eligible and mode == "attn":
            # attention-only band kernel (TPU-validated round 2); LN2/MLP
            # stay in XLA
            xp = attn_mod(None, fused_map=xp, shift=shift, deterministic=True)
        else:
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift)) if shift else None
            wins = window_partition(xp, ws)
            wins = attn_mod(wins, mask=mask, deterministic=deterministic)
            xp = window_reverse(wins, ws, hp, wp)

        if shift:
            xp = jnp.roll(xp, (shift, shift), axis=(1, 2))
        x = xp[:, :h, :w, :]

        rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
        x = shortcut + drop_path(x, self.drop_path_rate, deterministic, rng)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = MLP(
            hidden=int(self.dim * self.mlp_ratio),
            out=self.dim,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="ffn",
        )(y, deterministic=deterministic)
        rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class PatchMergingMM(nn.Module):
    """2× downsample matching mmdet's Unfold-based PatchMerging."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_b, pad_r = h % 2, w % 2
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            h, w = h + pad_b, w + pad_r
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)  # (B, h2, kh, w2, kw, C)
        x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, h2, w2, C, kh, kw)
        x = x.reshape(b, h // 2, w // 2, 4 * c)  # channel = c*4 + kh*2 + kw
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


@BACKBONES.register()
class SwinTransformer(nn.Module):
    """Swin backbone; returns per-level NHWC features (indices in out_indices)."""

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    fused_attention: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1  # honored by the optimizer mask, not here
    patch_size: int = 4
    dtype: Dtype = jnp.float32
    # accepted-but-unused reference config keys
    with_cp: bool = False
    convert_weights: bool = True
    pretrained: str | None = None
    init_cfg: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, 3) normalized image → tuple of NHWC feature maps."""
        ps = self.patch_size
        x = nn.Conv(
            self.embed_dims,
            (ps, ps),
            strides=(ps, ps),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        total_depth = sum(self.depths)
        dprs = np.linspace(0, self.drop_path_rate, total_depth)

        outs = []
        block_idx = 0
        dim = self.embed_dims
        for stage_i, depth in enumerate(self.depths):
            for blk_i in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[stage_i],
                    window_size=self.window_size,
                    shift=(blk_i % 2 == 1),
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop_rate=self.drop_rate,
                    attn_drop_rate=self.attn_drop_rate,
                    drop_path_rate=float(dprs[block_idx]),
                    fused_attention=self.fused_attention,
                    dtype=self.dtype,
                    name=f"stage{stage_i}_block{blk_i}",
                )(x, deterministic=deterministic)
                block_idx += 1
            if stage_i in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{stage_i}")(x)
                outs.append(out)
            if stage_i < len(self.depths) - 1:
                x = PatchMergingMM(out_dim=dim * 2, dtype=self.dtype, name=f"downsample{stage_i}")(x)
                dim *= 2
        return tuple(outs)
