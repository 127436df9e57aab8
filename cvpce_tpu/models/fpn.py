"""Feature Pyramid Network + P6P7 extra levels (flax).

Topology matches torchvision's FPN + LastLevelP6P7 as instantiated by the
reference's BackboneWithFPNAndGaussians (cvpce/models/proposals.py:109-139):
lateral 1x1 convs on C3..C5, nearest top-down 2x merges, 3x3 output convs,
then P6 = 3x3 s2 conv on P5 and P7 = 3x3 s2 conv on relu(P6) (use_P5=True
since in==out==256). Canvas dims must be divisible by 64 so nearest 2x
upsampling sizes align exactly.
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv, upsample_nearest_2x

Array = jnp.ndarray


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3: Array, c4: Array, c5: Array) -> List[Array]:
        oc = self.out_channels
        dt = self.dtype
        l3 = conv(oc, 1, use_bias=True, name="inner_0", dtype=dt)(c3)
        l4 = conv(oc, 1, use_bias=True, name="inner_1", dtype=dt)(c4)
        l5 = conv(oc, 1, use_bias=True, name="inner_2", dtype=dt)(c5)

        t5 = l5
        t4 = l4 + upsample_nearest_2x(t5)
        t3 = l3 + upsample_nearest_2x(t4)

        p3 = conv(oc, 3, use_bias=True, name="layer_0", dtype=dt)(t3)
        p4 = conv(oc, 3, use_bias=True, name="layer_1", dtype=dt)(t4)
        p5 = conv(oc, 3, use_bias=True, name="layer_2", dtype=dt)(t5)

        p6 = conv(oc, 3, strides=2, use_bias=True, name="p6", dtype=dt)(p5)
        p7 = conv(oc, 3, strides=2, use_bias=True, name="p7",
                  dtype=dt)(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
