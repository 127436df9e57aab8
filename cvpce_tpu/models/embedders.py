"""MAC descriptor embedders: MACVGG (DIHE's encoder) and MACResNet.

Re-design of cvpce/models/classification.py:20-85 in flax:
- MACVGG: VGG16(+BN) split at the last ReLU of blocks 4 and 5; descriptor is
  the concat of the spatial max (MAC) of both block outputs -> 1024-d,
  L2-normalized with an eps-clamped norm. Input is a [-1, 1] tanh-scaled
  image; ImageNet normalization (rescaled to tanh range) happens inside the
  forward, exactly like the reference (classification.py:41-44).
- MACResNet: the same MAC idea over ResNet-50 stage outputs (default stages
  c3+c4 -> 512+1024 = 1536-d).

Conv layers are named f{i} after their torchvision `features` index, so
torch checkpoints map 1:1 (see utils/torch_import.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import normalize_tanh_imagenet
from .layers import max_pool
from .resnet import ResNet50

Array = jnp.ndarray

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")


def _vgg_plan(batch_norm: bool):
    """Yield (kind, torch_index, channels) entries for the VGG16 features
    sequence, matching torchvision's layer indexing."""
    plan = []
    idx = 0
    for entry in VGG16_CFG:
        if entry == "M":
            plan.append(("pool", idx, 0))
            idx += 1
        else:
            plan.append(("conv", idx, entry))
            idx += 1
            if batch_norm:
                plan.append(("bn", idx, entry))
                idx += 1
            plan.append(("relu", idx, entry))
            idx += 1
    return plan


class Int8Conv(nn.Module):
    """3x3 same-pad conv on the TPU int8 MXU path: dynamic per-tensor
    activation quantization, per-output-channel weight quantization, int32
    accumulate, dequantized f32 epilogue. Param names/shapes match nn.Conv
    ('kernel' HWIO + 'bias'), so f32/bf16 checkpoints load unchanged —
    quantization happens at apply time."""
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                              1e-8) / 127.0
        wq = jnp.clip(jnp.round(kernel / w_scale), -127,
                      127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (a_scale * w_scale) + bias
        return y.astype(self.dtype)


# Conv ordinals (1-based through VGG16's 13 convs) where int8 measured
# faster than bf16 on v5e (scripts/profile_int8.py): everything except
# conv1_1 (3-channel, quant overhead dominates), conv2_1 and conv4_1
# (already near peak in bf16).
INT8_FAVORED_CONVS = frozenset({2, 4, 5, 6, 7, 9, 10, 11, 12, 13})


class MACVGG(nn.Module):
    """VGG16 MAC embedder, embedding_size = 1024.

    `int8`: opt-in serving fast path — runs the int8-favored conv layers
    (INT8_FAVORED_CONVS, measured on v5e) as dynamically-quantized int8
    MXU convs. Same checkpoint format; ~1.5x embed throughput at a small
    embedding-fidelity cost (validated in scripts/profile_embed_opt.py).
    """
    batch_norm: bool = True
    train: bool = False
    embedding_size: int = 1024
    eps: float = 1e-8
    dtype: Any = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = normalize_tanh_imagenet(x).astype(self.dtype)

        plan = _vgg_plan(self.batch_norm)
        # Split points: descriptor 1 after the last ReLU of block 4 (before
        # its pool), descriptor 2 after the last ReLU of block 5.
        pools_seen = 0
        conv_ordinal = 0
        desc1 = desc2 = None
        for kind, idx, ch in plan:
            if kind == "pool":
                pools_seen += 1
                if pools_seen == 4:
                    desc1 = jnp.max(x, axis=(1, 2))
                if pools_seen == 5:
                    desc2 = jnp.max(x, axis=(1, 2))
                    break
                x = max_pool(x, 2, 2)
            elif kind == "conv":
                conv_ordinal += 1
                if self.int8 and conv_ordinal in INT8_FAVORED_CONVS:
                    x = Int8Conv(ch, dtype=self.dtype, name=f"f{idx}")(x)
                else:
                    x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                use_bias=True, dtype=self.dtype,
                                name=f"f{idx}")(x)
            elif kind == "bn":
                x = nn.BatchNorm(use_running_average=not self.train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name=f"f{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)

        desc = jnp.concatenate([desc1, desc2], axis=1).astype(jnp.float32)
        norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        return desc / jnp.maximum(norm, self.eps)


class MACResNet(nn.Module):
    """ResNet-50 MAC embedder over stage outputs.

    descriptor_stages are reference `descriptor_layers` + 2 in our stage
    naming (reference layers [2, 3] == stages c3, c4 -> 1536-d).
    """
    descriptor_stages: Sequence[str] = ("c3", "c4")
    train: bool = False
    eps: float = 1e-8
    dtype: Any = jnp.float32

    @property
    def embedding_size(self) -> int:
        sizes = {"c1": 64, "c2": 256, "c3": 512, "c4": 1024, "c5": 2048}
        return sum(sizes[s] for s in self.descriptor_stages)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        feats = ResNet50(norm="batch", train=self.train, dtype=self.dtype,
                         name="trunk")(x)
        descs = [jnp.max(feats[s], axis=(1, 2)).astype(jnp.float32)
                 for s in self.descriptor_stages]
        desc = jnp.concatenate(descs, axis=1)
        norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        return desc / jnp.maximum(norm, self.eps)
