"""Feature Pyramid Network neck (NHWC).

Matches mmdet FPN as configured by the reference
(thirdparty/mmdetection/mmdet/models/necks/fpn.py; config
configs/nuhtc/...PanNuke...py:49-53): in [96,192,384,768] → 64ch × 4 levels,
lateral 1×1 convs (no norm/act), nearest-neighbor top-down sum, 3×3 output
convs (no act).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from nuhtc_tpu.registry import NECKS

Dtype = Any


@NECKS.register()
class FPN(nn.Module):
    in_channels: Sequence[int] = (96, 192, 384, 768)
    out_channels: int = 64
    num_outs: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway: nearest 2x upsample + add
        for i in range(len(laterals) - 1, 0, -1):
            up = laterals[i]
            b, h, w, c = up.shape
            th, tw = laterals[i - 1].shape[1:3]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)[:, :th, :tw, :]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"fpn{i}"
            )(laterals[i])
            for i in range(len(laterals))
        ]
        return tuple(outs[: self.num_outs])
