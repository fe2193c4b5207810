"""Alternative backbones: ViT (ViTDet-style) and SwinUnet (NHWC flax).

Reference: nuhtc/models/backbones/visiontransformer.py (446 LoC — the ViTDet
ViT: NHWC blocks, per-block plain-vs-windowed attention via
``window_block_indexes``, optional decomposed relative position embeddings,
absolute position embeddings resized from the pretrain grid, outputs every
3rd block). nuhtc/models/backbones/swin_unet.py is 100% commented-out dead
code in the reference — the SwinUnet here is a working beyond-reference
stand-in kept for experimentation. Neither backbone is used by a shipped
config (SURVEY.md §2a "Alt backbones/necks").

TPU notes: everything stays NHWC end-to-end (the reference permutes to NCHW
only for its FPN; our necks consume NHWC). Deviation: abs-pos resizing uses
jax.image.resize cubic (Keys a=-0.5) vs torch bicubic (a=-0.75) — sub-percent
interpolation difference on an off-main-path warm-start, documented here.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import BACKBONES
from nuhtc_tpu.models.layers import MLP
from nuhtc_tpu.models.swin import SwinBlock, PatchMergingMM

Dtype = Any


def _vit_window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) → ((B·nW, ws, ws, C), (Hp, Wp)) with zero padding
    (reference visiontransformer.py window_partition — no shift)."""
    b, h, w, c = x.shape
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def _vit_window_unpartition(wins: jnp.ndarray, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


def _rel_pos_1d(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Reference get_rel_pos for the q_size == k_size case used at runtime:
    index the (2·size-1, head_dim) table by pairwise relative coordinates."""
    coords = (
        np.arange(q_size)[:, None] - np.arange(k_size)[None, :] + (k_size - 1)
    )
    return rel_pos[coords]  # (q, k, head_dim) — static-index gather


class ViTAttention(nn.Module):
    """Reference visiontransformer.py Attention: packed qkv, optional
    decomposed relative position bias (add_decomposed_rel_pos)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Tuple[int, int] | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) → (B, H, W, C)."""
        b, h, w, c = x.shape
        hd = self.dim // self.num_heads
        scale = hd**-0.5
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h * w, self.num_heads, hd)
        k = k.reshape(b, h * w, self.num_heads, hd)
        v = v.reshape(b, h * w, self.num_heads, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)

        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, hd), jnp.float32,
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, hd), jnp.float32,
            )
            rh = _rel_pos_1d(rel_h, h, h).astype(attn.dtype)  # (h, h, hd)
            rw = _rel_pos_1d(rel_w, w, w).astype(attn.dtype)  # (w, w, hd)
            rq = q.reshape(b, h, w, self.num_heads, hd)
            bias_h = jnp.einsum("bhwnd,hkd->bnhwk", rq, rh)
            bias_w = jnp.einsum("bhwnd,wkd->bnhwk", rq, rw)
            attn = attn.reshape(b, self.num_heads, h, w, h, w)
            attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn.reshape(b, self.num_heads, h * w, h * w)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h * w, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, c)


class ViTBlock(nn.Module):
    """Reference visiontransformer.py Block: pre-LN attention (plain or
    windowed, no shift) + pre-LN MLP, both with residuals."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: Tuple[int, int] | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn_size = (
            (self.window_size, self.window_size)
            if self.window_size > 0
            else self.input_size
        )
        attn = ViTAttention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos, input_size=attn_size,
            dtype=self.dtype, name="attn",
        )
        if self.window_size > 0:
            wins, pad_hw = _vit_window_partition(x, self.window_size)
            wins = attn(wins)
            x = _vit_window_unpartition(wins, self.window_size, pad_hw, (h, w))
        else:
            x = attn(x)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLP(hidden=int(self.dim * self.mlp_ratio), out=self.dim,
                dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        return x + y


@BACKBONES.register()
class ViT(nn.Module):
    """ViTDet-style plain ViT (reference visiontransformer.py ViT): stride-16
    patch embed, absolute pos embeddings resized from the pretrain grid (cls
    token dropped), windowed attention on ``window_block_indexes`` blocks,
    optional decomposed relative position bias, features emitted after every
    3rd block."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dims: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    window_block_indexes: Sequence[int] = (0, 1, 3, 4, 6, 7, 9, 10)
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    out_every: int = 3  # reference: out.append after (i+1) % 3 == 0
    dtype: Dtype = jnp.float32
    # reference kwargs accepted for config parity
    drop_path_rate: float = 0.0
    init_cfg: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, _ = x.shape
        ps = self.patch_size
        x = nn.Conv(
            self.embed_dims, (ps, ps), strides=(ps, ps), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        hp, wp = x.shape[1:3]

        if self.use_abs_pos:
            grid = self.pretrain_img_size // ps
            n_pos = grid * grid + (1 if self.pretrain_use_cls_token else 0)
            pos = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, n_pos, self.embed_dims), jnp.float32,
            )
            if self.pretrain_use_cls_token:
                pos = pos[:, 1:]
            pos = pos.reshape(1, grid, grid, self.embed_dims)
            if (grid, grid) != (hp, wp):
                # reference: F.interpolate bicubic align_corners=False;
                # jax cubic kernel differs slightly (a=-0.5 vs -0.75)
                pos = jax.image.resize(
                    pos, (1, hp, wp, self.embed_dims), method="cubic"
                )
            x = x + pos.astype(x.dtype)

        outs = []
        for i in range(self.depth):
            x = ViTBlock(
                dim=self.embed_dims, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=self.window_size if i in self.window_block_indexes else 0,
                input_size=(hp, wp), dtype=self.dtype, name=f"block{i}",
            )(x, deterministic=deterministic)
            if (i + 1) % self.out_every == 0:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register()
class SwinUnet(nn.Module):
    """Swin encoder-decoder (U-shape) backbone. The reference's
    swin_unet.py is fully commented-out dead code; this is a working
    beyond-reference implementation: Swin stages down, patch-expand +
    skip-sum stages back up; returns decoder features at 4 scales."""

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ps = 4
        x = nn.Conv(self.embed_dims, (ps, ps), strides=(ps, ps), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        skips = []
        dim = self.embed_dims
        for s, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[s], window_size=self.window_size,
                    shift=(b % 2 == 1), dtype=self.dtype, name=f"enc{s}_block{b}",
                )(x, deterministic=deterministic)
            skips.append(x)
            if s < len(self.depths) - 1:
                x = PatchMergingMM(out_dim=dim * 2, dtype=self.dtype, name=f"down{s}")(x)
                dim *= 2

        outs = [x]  # deepest
        for s in range(len(self.depths) - 2, -1, -1):
            bsz, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Dense(c // 2, dtype=self.dtype, name=f"up{s}_expand")(x)
            th, tw = skips[s].shape[1:3]
            x = x[:, :th, :tw, :] + skips[s]
            x = SwinBlock(
                dim=c // 2, num_heads=self.num_heads[s], window_size=self.window_size,
                shift=False, dtype=self.dtype, name=f"dec{s}_block",
            )(x, deterministic=deterministic)
            outs.insert(0, x)
        return tuple(outs)
