"""DIHE's GAN domain adapter: U-Net-256 generator + averaging PatchGAN.

The reference pulls these from the pix2pix submodule
(cvpce/models/classification.py:8,123-127: define_G(3-or-4, 3, 64,
'unet_256') and define_D(3, 64, 'basic') wrapped with sigmoid + spatial
mean). The submodule isn't vendored, so these are re-authored here in flax
with the standard pix2pix topology: 8-level recursive U-Net with
(4,4)-stride-2 convs, LeakyReLU(0.2) down / ReLU up, BatchNorm, tanh
output; 3-layer 70x70 PatchGAN.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


def _down_conv(features: int, name: str, use_bias: bool = True) -> nn.Conv:
    return nn.Conv(features, (4, 4), strides=(2, 2),
                   padding=[(1, 1), (1, 1)], use_bias=use_bias, name=name)


def _up_conv(features: int, name: str, use_bias: bool = True
             ) -> nn.ConvTranspose:
    # SAME padding gives exactly out = in * stride, matching torch
    # ConvTranspose2d(kernel=4, stride=2, padding=1)
    return nn.ConvTranspose(features, (4, 4), strides=(2, 2),
                            padding="SAME", use_bias=use_bias, name=name)


class UNetGenerator(nn.Module):
    """U-Net with num_downs=8 (256 -> 1x1 bottleneck -> 256)."""
    out_channels: int = 3
    ngf: int = 64
    num_downs: int = 8
    train: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not self.train,
                                momentum=0.9, epsilon=1e-5, name=name)(y)

        ngf = self.ngf
        widths = [ngf, ngf * 2, ngf * 4] + [ngf * 8] * (self.num_downs - 3)

        # encoder
        skips = []
        y = x
        for i, w in enumerate(widths):
            if i == 0:
                y = _down_conv(w, f"down_{i}")(y)  # no norm on outermost
            else:
                y = _down_conv(w, f"down_{i}", use_bias=False)(
                    nn.leaky_relu(y, 0.2))
                if i < len(widths) - 1:  # innermost has no norm either
                    y = bn(y, f"down_bn_{i}")
            skips.append(y)

        # decoder
        for i in reversed(range(len(widths))):
            inner = skips[i]
            if i == len(widths) - 1:
                y = _up_conv(widths[i - 1], f"up_{i}", use_bias=False)(
                    nn.relu(inner))
                y = bn(y, f"up_bn_{i}")
            elif i > 0:
                y = jnp.concatenate([skips[i], y], axis=-1)
                y = _up_conv(widths[i - 1], f"up_{i}", use_bias=False)(
                    nn.relu(y))
                y = bn(y, f"up_bn_{i}")
            else:
                y = jnp.concatenate([skips[0], y], axis=-1)
                y = _up_conv(self.out_channels, "up_0")(nn.relu(y))
        return jnp.tanh(y)


class PatchGAN(nn.Module):
    """70x70 PatchGAN ('basic', n_layers=3). Raw patch logits."""
    ndf: int = 64
    train: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not self.train,
                                momentum=0.9, epsilon=1e-5, name=name)(y)

        y = nn.leaky_relu(_down_conv(self.ndf, "conv_0")(x), 0.2)
        y = nn.leaky_relu(bn(_down_conv(self.ndf * 2, "conv_1",
                                        use_bias=False)(y), "bn_1"), 0.2)
        y = nn.leaky_relu(bn(_down_conv(self.ndf * 4, "conv_2",
                                        use_bias=False)(y), "bn_2"), 0.2)
        y = nn.Conv(self.ndf * 8, (4, 4), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv_3")(y)
        y = nn.leaky_relu(bn(y, "bn_3"), 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       name="conv_4")(y)


class AveragingPatchGAN(nn.Module):
    """sigmoid(patch logits) averaged to one scalar per image
    (cvpce/models/classification.py:10-18)."""
    ndf: int = 64
    train: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        logits = PatchGAN(ndf=self.ndf, train=self.train, name="d")(x)
        return nn.sigmoid(logits).mean(axis=(1, 2, 3))
