"""Shared flax building blocks (NHWC, TPU-native layouts)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvModule(nn.Module):
    """Conv + (optional norm) + (optional act) — the mmcv ConvModule analog.

    The reference uses mmcv ConvModule with conv_cfg=None, norm_cfg=None
    everywhere in the active configs, i.e. plain conv + ReLU.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = (self.kernel_size, self.kernel_size)
        pad = self.padding
        x = nn.Conv(
            self.features,
            ks,
            strides=(self.strides, self.strides),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DenseParams(nn.Module):
    """Parameter holder with an nn.Dense-compatible tree (kernel/bias) so the
    same weights can feed a standard matmul, a fused Pallas kernel, or a
    split computation (e.g. fc0 folded into the banded RoI scan)."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features_out,), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class ConvParams(nn.Module):
    """Parameter holder with an nn.Conv-compatible tree (kernel/bias, HWIO)
    so the same weights can feed a standard conv or a computation that folds
    the conv elsewhere (e.g. the mask head's conv0 inside the banded RoI
    scan)."""

    ksize: int
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.features_in, self.features_out),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features_out,), jnp.float32)
        return k, b


class NormedLinear(nn.Module):
    """L2-normalized linear classifier with temperature (Seesaw predictor).

    Matches mmdet NormedLinear (thirdparty/mmdetection/mmdet/models/utils/
    normed_predictor.py:11-39): both weight rows and inputs are divided by
    (norm^power + eps), inputs scaled by temperature, bias added raw.
    """

    features: int
    temperature: float = 20.0
    power: float = 1.0
    eps: float = 1e-6
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01), (in_f, self.features), jnp.float32
        )
        kernel = kernel / (
            jnp.linalg.norm(kernel, axis=0, keepdims=True) ** self.power + self.eps
        )
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) ** self.power + self.eps)
        x = x * self.temperature
        y = jnp.einsum(
            "...i,io->...o", x, kernel, precision=jax.lax.Precision.HIGHEST
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        return y


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth on the batch axis."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class MLP(nn.Module):
    hidden: int
    out: int
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x
