"""Binary morphology + blur primitives on device, static-shape.

These re-express the host-side scipy/torchvision calls inside the reference's
watershed-proposal branch (reference nuhtc/models/htc_roi_head_cus.py:239-320)
as pure XLA ops:

- ``gaussian_blur5``: torchvision ``TF.gaussian_blur(kernel_size=5)`` —
  sigma = 0.3*((k-1)*0.5 - 1) + 0.8 = 1.1, reflect padding;
- ``binary_erosion/dilation/open``: the reference's conv-based formulation
  (5×5 ones kernel, zero padding);
- ``fill_holes``: scipy ``ndi.binary_fill_holes`` (4-connectivity flood fill
  of the complement from the border, to fixpoint).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel1d(kernel_size: int = 5, sigma: float | None = None) -> np.ndarray:
    if sigma is None:
        sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def gaussian_blur5(img: jnp.ndarray, kernel_size: int = 5, sigma: float | None = None) -> jnp.ndarray:
    """Separable gaussian blur with reflect padding. img: (..., H, W).

    Implemented as weighted shifted slices on the VPU — single-channel convs
    waste the MXU (1/128 lane utilization, measured 10 ms vs ~2 ms here).
    """
    kv = gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2
    orig_shape = img.shape
    h, w = orig_shape[-2:]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    # rows
    x = sum(float(kv[i]) * x[:, i : i + h, :] for i in range(kernel_size))
    # cols
    x = sum(float(kv[i]) * x[:, :, i : i + w] for i in range(kernel_size))
    return x.reshape(orig_shape).astype(img.dtype)


def _conv_ones(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Sum over a ksize×ksize window with zero padding — separable shifted
    adds (VPU), exact for the small integer counts involved."""
    shape = x.shape
    h, w = shape[-2:]
    pad = ksize // 2
    xf = x.reshape((-1, h, w)).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (pad, pad), (pad, pad)))
    xf = sum(xf[:, i : i + h, :] for i in range(ksize))
    xf = sum(xf[:, :, i : i + w] for i in range(ksize))
    return xf.reshape(shape)


def binary_erosion(mask: jnp.ndarray, ksize: int = 5, iterations: int = 1) -> jnp.ndarray:
    """Reference formulation: conv with ones, clamp(x - k² + 1, 0, 1)."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = jnp.clip(_conv_ones(m, ksize) - ksize * ksize + 1.0, 0.0, 1.0)
    return m


def binary_dilation(mask: jnp.ndarray, ksize: int = 5, iterations: int = 1) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = jnp.clip(_conv_ones(m, ksize), 0.0, 1.0)
    return m


def binary_open(mask: jnp.ndarray, ksize: int = 5, iterations: int = 1) -> jnp.ndarray:
    return binary_dilation(binary_erosion(mask, ksize, iterations), ksize, iterations)


def binary_close(mask: jnp.ndarray, ksize: int = 5, iterations: int = 1) -> jnp.ndarray:
    return binary_erosion(binary_dilation(mask, ksize, iterations), ksize, iterations)


def _dilate4(x: jnp.ndarray) -> jnp.ndarray:
    """One step of 4-connected binary dilation. x: (H, W) bool."""
    up = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return x | up | down | left | right


def _flood(seed: jnp.ndarray, allowed: jnp.ndarray, max_iters: int, inner: int) -> jnp.ndarray:
    """Shift-based 4-connected flood of ``seed`` through ``allowed``."""

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        o, _, it = state
        o2 = o
        for _ in range(inner):
            o2 = allowed & _dilate4(o2)
        return o2, jnp.any(o2 != o), it + 1

    out, _, _ = jax.lax.while_loop(cond, body, (seed & allowed, jnp.array(True), jnp.int32(0)))
    return out


def fill_holes(
    mask: jnp.ndarray, max_iters: int = 48, inner: int = 32, coarse_factor: int = 4
) -> jnp.ndarray:
    """scipy ``binary_fill_holes`` semantics (4-connectivity). mask: (H, W) bool.

    Border-seeded flood through the background; background never reached is a
    hole. The flood always travels ~(H+W)/2 pixels, so a conservative coarse
    pass runs first: blocks that are fully background (min-pool) flood at
    1/coarse_factor resolution, seeding the fine flood. The coarse pass can
    only under-reach (never crosses walls), and the fine pass finishes
    boundaries; only ultra-narrow (<coarse_factor px) channels longer than
    the fine budget could stay unfilled — not a case nuclei masks produce.
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    border = jnp.zeros((h, w), dtype=bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    bg = ~mask
    seed = bg & border

    f = coarse_factor
    if f > 1 and h % f == 0 and w % f == 0 and min(h, w) >= 16 * f:
        bg_c = jnp.all(bg.reshape(h // f, f, w // f, f), axis=(1, 3))  # all-bg blocks
        border_c = jnp.zeros((h // f, w // f), bool)
        border_c = border_c.at[0, :].set(True).at[-1, :].set(True)
        border_c = border_c.at[:, 0].set(True).at[:, -1].set(True)
        out_c = _flood(border_c & bg_c, bg_c, max_iters=max(h, w) // (f * 8) + 4, inner=8)
        seed = seed | (jnp.repeat(jnp.repeat(out_c, f, 0), f, 1) & bg)

    outside = _flood(seed, bg, max_iters=max_iters, inner=inner)
    return mask | (bg & ~outside)
