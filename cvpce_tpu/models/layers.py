"""Shared flax building blocks.

Conventions: NHWC activations, HWIO conv kernels (use
cvpce_tpu.utils.torch_import to convert torch OIHW checkpoints).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine params.

    Equivalent of torchvision's FrozenBatchNorm2d, which the reference uses
    for the whole GLN backbone (cvpce/models/proposals.py:184). All four
    tensors live in the 'frozen' variable collection, so nothing here is
    trainable and nothing updates — matching torch buffers.
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.variable("frozen", "scale",
                              lambda: jnp.ones(self.features, jnp.float32))
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros(self.features, jnp.float32))
        mean = self.variable("frozen", "mean",
                             lambda: jnp.zeros(self.features, jnp.float32))
        var = self.variable("frozen", "var",
                            lambda: jnp.ones(self.features, jnp.float32))
        # fold stats in f32, apply in the activation dtype
        inv = scale.value / jnp.sqrt(var.value + self.eps)
        shift = bias.value - mean.value * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class BatchNorm(nn.Module):
    """Standard BN wrapper with torch-compatible defaults (momentum 0.9 in
    flax terms == torch momentum 0.1; eps 1e-5)."""
    features: int
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
        )(x)


def conv(features: int, kernel: int, strides: int = 1, use_bias: bool = False,
         name: Optional[str] = None, padding: Optional[int] = None,
         dtype=jnp.float32) -> nn.Conv:
    """3x3/1x1/7x7 conv with torch-style symmetric padding.

    `dtype` is the compute dtype (params stay f32): pass bfloat16 to run
    on the MXU's native precision.
    """
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(strides, strides),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


class Im2colConv(nn.Module):
    """Drop-in nn.Conv twin for thin-Cin convs, contracted as im2col.

    XLA lowers a Cin=3 conv by padding the contraction to the 128-lane
    MXU width — a 42x FLOP waste that puts the ResNet stem at 4.4
    TFLOP/s and MACVGG conv1_1 at 8x its speed-of-light (PERF.md r4
    trunk profile). This module builds the im2col matrix with static
    strided slices + concat (pure data movement) and contracts
    K = kh*kw*cin on the MXU at real utilization. Param names/shapes
    match nn.Conv ('kernel' HWIO + optional 'bias'), so checkpoints are
    unchanged; numerics differ from lax.conv only by bf16 accumulation
    order (f32 accumulate in both).
    """
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, s, p = self.kernel_size, self.strides, self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        ho = (h + 2 * p - k) // s + 1
        wo = (w + 2 * p - k) // s + 1
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        cols = [
            xp[:, dy:dy + (ho - 1) * s + 1:s,
               dx:dx + (wo - 1) * s + 1:s, :]
            for dy in range(k) for dx in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1)   # (b, ho, wo, k*k*cin)
        wk = kernel.reshape(k * k * cin, self.features).astype(self.dtype)
        y = jnp.einsum("bhwk,ko->bhwo", patches, wk,
                       preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def max_pool(x: Array, window: int, strides: int, padding: int = 0) -> Array:
    """Torch-style max pool (symmetric int padding, -inf fill)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return nn.max_pool(
        x, (window, window), strides=(strides, strides),
        padding=[(padding, padding), (padding, padding)],
    )


def upsample_nearest_2x(x: Array) -> Array:
    """2x nearest-neighbor upsample (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
