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


def _shift_bool(x: jnp.ndarray, k: int, axis: int, rev: bool) -> jnp.ndarray:
    """x'[i] = x[i-k] (or x[i+k] if rev) along ``axis``, False-filled."""
    if axis == 0:
        if rev:
            return jnp.pad(x[k:, :], ((0, k), (0, 0)))
        return jnp.pad(x[:-k, :], ((k, 0), (0, 0)))
    if rev:
        return jnp.pad(x[:, k:], ((0, 0), (0, k)))
    return jnp.pad(x[:, :-k], ((0, 0), (k, 0)))


def _sweep_or(v: jnp.ndarray, allowed: jnp.ndarray, axis: int, rev: bool) -> jnp.ndarray:
    """Segmented OR scan (Hillis-Steele doubling): after the sweep, v[i] is
    True iff some v[j] was True with j..i a contiguous ``allowed`` run along
    the given direction. log2(n) steps of shifts — no per-pixel stepping."""
    n = v.shape[axis]
    run = allowed & _shift_bool(allowed, 1, axis, rev)
    k = 1
    while k < n:
        v = v | (_shift_bool(v, k, axis, rev) & run)
        run = run & _shift_bool(run, k, axis, rev)
        k *= 2
    return v


def _flood_scan(seed: jnp.ndarray, allowed: jnp.ndarray, max_rounds: int = 64) -> jnp.ndarray:
    """4-connected flood of ``seed`` through ``allowed`` via alternating
    directional segmented scans, to fixpoint. Each round covers arbitrarily
    long straight runs (log-step doubling), so border floods converge in a
    handful of rounds instead of ~(H+W) single-pixel dilations."""
    v0 = seed & allowed

    def body(state):
        v, _, it = state
        v2 = v
        for axis, rev in ((1, False), (1, True), (0, False), (0, True)):
            v2 = _sweep_or(v2, allowed, axis, rev)
        return v2, jnp.any(v2 != v), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_rounds)

    out, _, _ = jax.lax.while_loop(cond, body, (v0, jnp.array(True), jnp.int32(0)))
    return out


def fill_holes(mask: jnp.ndarray, max_rounds: int = 64) -> jnp.ndarray:
    """scipy ``binary_fill_holes`` semantics (4-connectivity). mask: (H, W) bool.

    Border-seeded flood through the background (scan-based, exact fixpoint);
    background never reached is a hole."""
    mask = mask.astype(bool)
    h, w = mask.shape
    border = jnp.zeros((h, w), dtype=bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    bg = ~mask
    outside = _flood_scan(bg & border, bg, max_rounds=max_rounds)
    return mask | (bg & ~outside)
