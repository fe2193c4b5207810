"""Mask + semantic heads (NHWC flax).

- ``HTCMaskHead``: FCN mask head with HTC info-flow residual conv
  (thirdparty/mmdetection/mmdet/models/roi_heads/mask_heads/htc_mask_head.py:
  1-39 + fcn_mask_head.py): 4× 3×3 conv + ReLU, optional 1×1 res conv on the
  incoming info-flow feature, 2× deconv + ReLU, 1×1 logits (class-agnostic →
  1 channel, 28×28 from 14×14 RoI features).
- ``FusedSemanticHead``: multi-level fusion at level 0
  (fused_semantic_head.py:13-117): 1×1 laterals, bilinear(align_corners=True)
  upsample-sum, 4× 3×3 convs, 1×1 logits (1 class) + 1×1 embedding feature.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import HEADS
from nuhtc_tpu.models.layers import ConvParams
from nuhtc_tpu.ops.components import resize_align_corners

Dtype = Any


class _TiedDeconv22Params(nn.Module):
    """Parameter holder with the EXACT pytree layout of
    ``nn.ConvTranspose(features, (2, 2), strides=(2, 2), padding='VALID')`` —
    same param names/shapes/initializers under the same module name, so
    checkpoints trained under either mask-tail lowering interoperate."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _TiedConv1x1Params(nn.Module):
    """Same, for ``nn.Conv(features, (1, 1))``."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


@HEADS.register()
class HTCMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 64
    conv_out_channels: int = 64
    num_classes: int = 5
    class_agnostic: bool = True
    with_conv_res: bool = True
    dtype: Dtype = jnp.float32
    loss_mask: Any = None  # config key

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits=True, return_feat=True,
                 conv0_pre: bool = False, return_conv0: bool = False):
        """x: (R, S, S, C). Returns logits (R, 2S, 2S, out) and/or feat.

        Split-conv0 modes (the banded RoI scan folds conv0's SAME 3×3 conv
        into its loop body — roi_extractor.banded_stage_features
        ``conv0_kernel``; valid only for the res_feat=None lite path since
        conv0 must see x + res_feat otherwise):
          ``return_conv0=True`` → (kernel (3, 3, C, C'), bias (C',)).
          ``conv0_pre=True`` → x is the (R, S, S, C') pre-bias conv0 output;
          the head adds bias + ReLU and continues from conv1."""
        if return_conv0 or conv0_pre:
            w0, b0 = ConvParams(
                3, self.in_channels, self.conv_out_channels, name="conv0"
            )()
            if return_conv0:
                return w0, b0
            assert res_feat is None, "conv0 fold requires res_feat=None"
            x = nn.relu((x + b0).astype(self.dtype))
            start = 1
        else:
            if res_feat is not None:
                res_feat = nn.relu(
                    nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype, name="conv_res")(res_feat)
                )
                x = x + res_feat
            start = 0
        for i in range(start, self.num_convs):
            x = nn.relu(
                nn.Conv(
                    self.conv_out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i}"
                )(x)
            )
        feat = x
        outs = []
        if return_logits:
            out_ch = 1 if self.class_agnostic else self.num_classes
            # d2s default (round 5): whole-model A/B 114.3 → 114.7 tiles/s,
            # and stacked with band-24 + stage-2/3 Swin kernels the combo
            # measured 127.0 — NUHTC_MASK_TAIL=deconv restores the reference
            # lowering (exact same math either way, tests/test_mask_tail.py)
            if os.environ.get("NUHTC_MASK_TAIL", "d2s") == "d2s":
                # Fused lowering of deconv→ReLU→1×1 logits: a 2×2 stride-2
                # VALID ConvTranspose has non-overlapping taps, so
                # y[2i+a, 2j+b, o] = Σ_c x[i,j,c]·K[1-a,1-b,c,o] — one matmul
                # (K folded to (C, 4·C')) followed by bias+ReLU and the 1×1
                # logits contraction IN THE SAME fusion, then depth-to-space
                # on the (R,14,14,2,2,out) result. The (R,28,28,C')
                # activation (~800 MB bf16 at B16×500 rois) never reaches
                # HBM. Exact vs the deconv path up to matmul accumulation
                # order (tests/test_mask_tail.py).
                r, s, _, cin = x.shape
                kup, bup = _TiedDeconv22Params(
                    cin, self.conv_out_channels, name="upsample",
                )()
                klog, blog = _TiedConv1x1Params(
                    self.conv_out_channels, out_ch, name="conv_logits"
                )()
                co = self.conv_out_channels
                # (2,2,C,Co) → flip taps → (C, 2*2*Co)
                w = kup[::-1, ::-1].transpose(2, 0, 1, 3).reshape(cin, 4 * co)
                z = jnp.dot(
                    x.reshape(r * s * s, cin).astype(self.dtype),
                    w.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                ).reshape(r, s, s, 2, 2, co)
                z = nn.relu((z + bup).astype(self.dtype))
                logits = (
                    jnp.einsum(
                        "rijabc,co->rijabo", z, klog[0, 0].astype(self.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + blog
                )
                logits = logits.transpose(0, 1, 3, 2, 4, 5).reshape(
                    r, 2 * s, 2 * s, out_ch
                )
            else:
                y = nn.ConvTranspose(
                    self.conv_out_channels,
                    (2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    name="upsample",
                )(x)
                y = nn.relu(y)
                logits = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="conv_logits")(y)
            outs.append(logits.astype(jnp.float32))
        if return_feat:
            outs.append(feat)
        return outs[0] if len(outs) == 1 else tuple(outs)


@HEADS.register()
class FusedSemanticHead(nn.Module):
    num_ins: int = 4
    fusion_level: int = 0
    num_convs: int = 4
    in_channels: int = 64
    conv_out_channels: int = 64
    num_classes: int = 1
    dtype: Dtype = jnp.float32
    loss_seg: Any = None  # config key

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: per-level (B, H, W, C) → (logits (B, H0, W0, num_classes),
        embedding (B, H0, W0, C))."""
        fl = self.fusion_level
        x = nn.relu(
            nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name=f"lateral{fl}")(feats[fl])
        )
        th, tw = x.shape[1:3]
        for i, f in enumerate(feats[: self.num_ins]):
            if i == fl:
                continue
            lat = nn.relu(
                nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(f)
            )
            # bilinear align_corners=True upsample to fusion level size
            lat = resize_align_corners(lat.transpose(0, 3, 1, 2), (th, tw)).transpose(0, 2, 3, 1)
            x = x + lat
        for i in range(self.num_convs):
            x = nn.relu(
                nn.Conv(
                    self.conv_out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i}"
                )(x)
            )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv_logits")(x)
        embedding = nn.relu(
            nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype, name="conv_embedding")(x)
        )
        return logits.astype(jnp.float32), embedding
