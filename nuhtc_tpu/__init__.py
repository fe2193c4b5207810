"""NuHTC-TPU: a TPU-native nuclei instance segmentation & classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of boyden/NuHTC
(Hybrid Task Cascade for H&E histopathology): Swin-T + FPN + RPN +
3-stage cascade bbox heads + single mask head + fused semantic head +
connected-component ("watershed") proposal injection, with a full
whole-slide-image inference pipeline and PQ/AJI/Dice evaluation stack.

Everything on the device path is static-shape, batched, and jit-compiled;
parallelism is expressed through `jax.sharding.Mesh` + NamedSharding.
"""

from nuhtc_tpu.version import __version__

__all__ = ["__version__"]
