"""ResNet-50 trunk in flax (NHWC), torch-checkpoint importable.

GLN's backbone is torchvision resnet50 with FrozenBatchNorm
(cvpce/models/proposals.py:183-191); DIHE's MACResNet wraps the same trunk
with regular BN (cvpce/models/classification.py:111-121). This module
provides both via `norm`: 'frozen' (inference-frozen stats, nothing
trainable) or 'batch' (flax BatchNorm with batch_stats).

Returns the per-stage feature maps C1..C5; consumers pick what they need
(FPN uses C2..C5, the Gaussian branch taps C2, MACResNet pools stage
outputs).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, conv, max_pool
from .quant import qconv

Array = jnp.ndarray

RESNET50_STAGES = (3, 4, 6, 3)
STAGE_FEATURES = (64, 128, 256, 512)  # bottleneck inner widths


class _Norm(nn.Module):
    features: int
    kind: str = "frozen"  # 'frozen' | 'batch' | 'none'
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.kind == "frozen":
            return FrozenBatchNorm(self.features, name="fbn")(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not self.train, momentum=0.9,
                epsilon=1e-5, name="bn", dtype=self.dtype,
            )(x)
        if self.kind == "none":
            return x
        raise ValueError(self.kind)


class Bottleneck(nn.Module):
    features: int          # inner width; output is features * 4
    strides: int = 1
    downsample: bool = False
    norm: str = "frozen"
    train: bool = False
    dtype: Any = jnp.float32
    quant: Optional[str] = None  # None | 'static' | 'calibrate' | 'dynamic'
    conv_bias: bool = False      # biased convs for the folded-FBN twin

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype

        def _c(features, kernel, strides=1, name=None):
            if self.quant:
                return qconv(features, kernel, strides=strides, name=name,
                             dtype=dt, quant=self.quant,
                             use_bias=self.conv_bias)
            return conv(features, kernel, strides=strides, name=name,
                        dtype=dt, use_bias=self.conv_bias)

        residual = x
        y = _c(self.features, 1, name="conv1")(x)
        y = _Norm(self.features, self.norm, self.train, dt, name="bn1")(y)
        y = nn.relu(y)
        y = _c(self.features, 3, strides=self.strides, name="conv2")(y)
        y = _Norm(self.features, self.norm, self.train, dt, name="bn2")(y)
        y = nn.relu(y)
        y = _c(self.features * 4, 1, name="conv3")(y)
        y = _Norm(self.features * 4, self.norm, self.train, dt,
                  name="bn3")(y)
        if self.downsample:
            residual = _c(self.features * 4, 1, strides=self.strides,
                          name="downsample_conv")(x)
            residual = _Norm(self.features * 4, self.norm, self.train, dt,
                             name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    norm: str = "frozen"
    train: bool = False
    stages: Sequence[int] = RESNET50_STAGES
    dtype: Any = jnp.float32
    # int8 MXU serving path for all stage convs (models/quant.py); the
    # 7x7 stem stays bf16 — its 3-channel input makes quantization
    # overhead dominate (same finding as MACVGG conv1_1, PERF.md r2)
    quant: Optional[str] = None
    # biased convs: the serving twin for fold_frozen_bn (norm='none',
    # conv_bias=True) — the FBN affine lives in kernel scales + biases
    conv_bias: bool = False
    # stem as an explicit im2col contraction (layers.Im2colConv): same
    # 'conv1' params, avoids XLA's Cin=3 -> 128-lane padding (the stem
    # measured 4.74 ms of the 13.14 ms b4 trunk, PERF.md r4)
    stem_im2col: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        from .layers import Im2colConv

        x = x.astype(self.dtype)
        if self.stem_im2col:
            y = Im2colConv(64, kernel_size=7, strides=2, padding=3,
                           use_bias=self.conv_bias, name="conv1",
                           dtype=self.dtype)(x)
        else:
            y = conv(64, 7, strides=2, name="conv1", dtype=self.dtype,
                     use_bias=self.conv_bias)(x)
        y = _Norm(64, self.norm, self.train, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        c1 = y
        y = max_pool(y, 3, 2, padding=1)

        feats = {"c1": c1}
        for stage_i, (blocks, width) in enumerate(
            zip(self.stages, STAGE_FEATURES)
        ):
            strides = 1 if stage_i == 0 else 2
            for block_i in range(blocks):
                y = Bottleneck(
                    width,
                    strides=strides if block_i == 0 else 1,
                    downsample=block_i == 0,
                    norm=self.norm,
                    train=self.train,
                    dtype=self.dtype,
                    quant=self.quant,
                    conv_bias=self.conv_bias,
                    name=f"layer{stage_i + 1}_{block_i}",
                )(y)
            feats[f"c{stage_i + 2}"] = y
        return feats


# conv -> FrozenBN pairings inside a Bottleneck (and the stem): the
# only sites fold_frozen_bn has to know about
_BOTTLENECK_PAIRS = (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"),
                     ("downsample_conv", "downsample_bn"))


def fold_frozen_bn(variables, eps: float = 1e-5):
    """Fold FrozenBN affines+stats into conv kernels/biases (serving).

    FrozenBN is a per-output-channel affine y = x*inv + shift with
    inv = scale/sqrt(var+eps), shift = bias - mean*inv
    (torchvision FrozenBatchNorm2d, cvpce/models/proposals.py:184).
    Applied after a bias-free conv it commutes exactly into the conv:
    kernel[..., o] *= inv[o]; bias[o] = shift[o]. Returns variables for
    the `norm='none', conv_bias=True` twin of a `norm='frozen'` ResNet50
    — same math, no separate affine pass over the activations. The int8
    path absorbs `inv` into its per-output-channel weight scales, so the
    fold is exact there too (models/quant.py:70-73).
    """
    import numpy as np

    params = _tree_to_dict(variables["params"])
    frozen = _tree_to_dict(variables.get("frozen", {}))

    def fold_site(conv_p, fbn):
        inv = np.asarray(fbn["scale"]) / np.sqrt(
            np.asarray(fbn["var"]) + eps)
        shift = np.asarray(fbn["bias"]) - np.asarray(fbn["mean"]) * inv
        kernel = np.asarray(conv_p["kernel"]) * inv  # last axis = Cout
        return {"kernel": kernel.astype(np.asarray(conv_p["kernel"]).dtype),
                "bias": shift.astype(np.float32)}

    out = {}
    for key, sub in params.items():
        if key == "conv1" and "bn1" in frozen:  # stem
            out[key] = fold_site(sub, frozen["bn1"]["fbn"])
        elif key.startswith("layer") and key in frozen:
            blk = dict(sub)
            for cname, bname in _BOTTLENECK_PAIRS:
                if cname in blk and bname in frozen[key]:
                    blk[cname] = fold_site(blk[cname],
                                           frozen[key][bname]["fbn"])
            out[key] = blk
        else:
            out[key] = sub
    folded = {"params": out}
    for coll, tree in variables.items():
        if coll not in ("params", "frozen"):
            folded[coll] = tree
    return folded


def _tree_to_dict(tree):
    if hasattr(tree, "items"):
        return {k: _tree_to_dict(v) for k, v in tree.items()}
    return tree
