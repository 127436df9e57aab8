"""Feature Pyramid Network + P6P7 extra levels (flax).

Topology matches torchvision's FPN + LastLevelP6P7 as instantiated by the
reference's BackboneWithFPNAndGaussians (cvpce/models/proposals.py:109-139):
lateral 1x1 convs on C3..C5, nearest top-down 2x merges, 3x3 output convs,
then P6 = 3x3 s2 conv on P5 and P7 = 3x3 s2 conv on relu(P6) (use_P5=True
since in==out==256). Canvas dims must be divisible by 64 so nearest 2x
upsampling sizes align exactly.
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv, upsample_nearest_2x
from .quant import qconv

Array = jnp.ndarray


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32
    # int8 MXU serving path for every FPN conv (models/quant.py)
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, c3: Array, c4: Array, c5: Array) -> List[Array]:
        oc = self.out_channels
        dt = self.dtype

        def _c(kernel, strides=1, name=None):
            if self.quant:
                return qconv(oc, kernel, strides=strides, use_bias=True,
                             name=name, dtype=dt, quant=self.quant)
            return conv(oc, kernel, strides=strides, use_bias=True,
                        name=name, dtype=dt)

        l3 = _c(1, name="inner_0")(c3)
        l4 = _c(1, name="inner_1")(c4)
        l5 = _c(1, name="inner_2")(c5)

        t5 = l5
        t4 = l4 + upsample_nearest_2x(t5)
        t3 = l3 + upsample_nearest_2x(t4)

        p3 = _c(3, name="layer_0")(t3)
        p4 = _c(3, name="layer_1")(t4)
        p5 = _c(3, name="layer_2")(t5)

        p6 = _c(3, strides=2, name="p6")(p5)
        p7 = _c(3, strides=2, name="p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
