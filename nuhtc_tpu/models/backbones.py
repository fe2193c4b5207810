"""Alternative backbones: ViT and SwinUnet (NHWC flax).

Registered-but-unused in the shipped reference configs (reference
nuhtc/models/backbones/visiontransformer.py, swin_unet.py — SURVEY.md §2a
"Alt backbones/necks"); provided for config-compatibility and experiments.
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


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, N, C) tokens."""
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLP(hidden=int(self.dim * self.mlp_ratio), out=self.dim, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic
        )
        return x + y


@BACKBONES.register()
class ViT(nn.Module):
    """Plain ViT backbone returning a single stride-16 feature map
    (reference nuhtc/models/backbones/visiontransformer.py)."""

    embed_dims: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (-1,)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, _ = x.shape
        ps = self.patch_size
        x = nn.Conv(
            self.embed_dims, (ps, ps), strides=(ps, ps), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        hp, wp = x.shape[1:3]
        tokens = x.reshape(b, hp * wp, self.embed_dims)
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, hp * wp, self.embed_dims), jnp.float32,
        )
        tokens = tokens + pos.astype(tokens.dtype)
        outs = []
        out_set = {i % self.depth for i in self.out_indices}
        for i in range(self.depth):
            tokens = ViTBlock(
                dim=self.embed_dims, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype, name=f"block{i}",
            )(tokens, deterministic=deterministic)
            if i in out_set:
                outs.append(tokens.reshape(b, hp, wp, self.embed_dims))
        return tuple(outs)


@BACKBONES.register()
class SwinUnet(nn.Module):
    """Swin encoder-decoder (U-shape) backbone
    (reference nuhtc/models/backbones/swin_unet.py): Swin stages down,
    upsample+skip stages back up; returns decoder features at 4 scales."""

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
