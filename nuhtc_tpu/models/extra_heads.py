"""Additional heads + necks: HTCSegHead / HTCSegBranch / ViT_FPN.

Reference components (nuhtc/models/htc_seg_head_cus.py:1-353,
nuhtc/necks/vit_fpn.py) — inactive in the shipped configs (seg_head=None)
but part of the framework surface. HTCSegHead fuses raw-image convs with the
upsampled semantic feature and predicts a binary seg map, a normalized
distance map, and a global multi-label classification vector; its GT distance
transform (torch erosion loop in the reference, :115-191) is provided as
``soft_distance_target``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import HEADS, NECKS
from nuhtc_tpu.ops.components import resize_align_corners
from nuhtc_tpu.ops import morphology

Dtype = Any


@HEADS.register()
class HTCSegHead(nn.Module):
    """Binary seg + distance map + global cls from raw image + semantic feat."""

    in_channels: int = 64
    conv_out_channels: int = 64
    num_convs: int = 2
    num_classes: int = 1
    dtype: Dtype = jnp.float32
    loss_seg: Any = None
    loss_dist: Any = None
    loss_cls: Any = None

    @nn.compact
    def __call__(self, img, semantic_feat):
        """img (B, H, W, 3); semantic_feat (B, H/4, W/4, C)."""
        b, h, w, _ = img.shape
        x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), strides=(2, 2),
                            padding="SAME", dtype=self.dtype, name="img_conv0")(img))
        x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), strides=(2, 2),
                            padding="SAME", dtype=self.dtype, name="img_conv1")(x))
        sem = resize_align_corners(
            semantic_feat.transpose(0, 3, 1, 2), x.shape[1:3]
        ).transpose(0, 2, 3, 1)
        x = x + nn.relu(nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype,
                                name="sem_lateral")(sem))
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"conv{i}")(x))
        feat = x
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv_seg")(x)
        dist = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_dist")(x)
        g = jnp.mean(x, axis=(1, 2))
        cls = nn.Dense(max(self.num_classes, 1), dtype=self.dtype, name="fc_cls")(g)
        # upsample predictions to image resolution
        seg = resize_align_corners(seg.transpose(0, 3, 1, 2), (h, w)).transpose(0, 2, 3, 1)
        dist = resize_align_corners(dist.transpose(0, 3, 1, 2), (h, w)).transpose(0, 2, 3, 1)
        return feat, seg.astype(jnp.float32), dist[..., 0].astype(jnp.float32), cls.astype(jnp.float32)


@HEADS.register()
class HTCSegBranch(HTCSegHead):
    """n-class variant of HTCSegHead (reference htc_seg_head_cus.py:238-353)."""


def soft_distance_target(mask: jnp.ndarray, iterations: int = 8) -> jnp.ndarray:
    """Normalized interior-distance map via iterated erosion (the reference's
    torch erosion/boundary formulation, htc_seg_head_cus.py:115-191):
    distance ≈ (number of erosions survived) / iterations."""
    m = mask.astype(jnp.float32)
    acc = jnp.zeros_like(m)
    cur = m
    for _ in range(iterations):
        cur = morphology.binary_erosion(cur, ksize=3, iterations=1)
        acc = acc + cur
    return acc / iterations


@NECKS.register()
class ViT_FPN(nn.Module):
    """Single-scale ViT feature → 4-level pyramid (reference nuhtc/necks/
    vit_fpn.py): deconv ×4/×2, identity, and stride-2 pooling branches,
    then 1×1 projections to out_channels."""

    out_channels: int = 64
    dtype: Dtype = jnp.float32
    in_channels: Any = None

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]  # (B, H/16, W/16, C)
        up4 = nn.ConvTranspose(self.out_channels, (4, 4), strides=(4, 4),
                               dtype=self.dtype, name="up4")(x)
        up2 = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="up2")(x)
        same = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="same")(x)
        down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
                       dtype=self.dtype, name="down")(x)
        return (up4, up2, same, down)
