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

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import normalize_tanh_imagenet
from . import quant
from . import layers
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


# The quantized conv itself is shared with the detector's int8 path
# (3x3 same-pad + bias is exactly its default configuration here).
Int8Conv = quant.Int8Conv


# Conv ordinals (1-based through VGG16's 13 convs) where int8 measured
# faster than bf16 on v5e (scripts/profile_int8.py): everything except
# conv1_1 (3-channel, quant overhead dominates), conv2_1 and conv4_1
# (already near peak in bf16).
INT8_FAVORED_CONVS = frozenset({2, 4, 5, 6, 7, 9, 10, 11, 12, 13})

# All convs except conv1_1 (ordinal 1): its 3-channel input makes the
# quantization overhead dominate the tiny matmul regardless of scales.
INT8_ALL_CONVS = frozenset(range(2, 14))


class MACVGG(nn.Module):
    """VGG16 MAC embedder, embedding_size = 1024.

    `int8`: opt-in serving fast path — runs the int8-favored conv layers
    (INT8_FAVORED_CONVS, measured on v5e) as dynamically-quantized int8
    MXU convs. Same checkpoint format; ~1.5x embed throughput at a small
    embedding-fidelity cost (validated in scripts/profile_embed_opt.py).

    `int8_all` widens the int8 set to every conv but conv1_1 (worth it
    once scales are static); `int8_static` uses calibrated per-layer
    activation scales from the 'act_scales' collection instead of
    per-batch dynamic abs-max (see `calibrate_int8_scales`);
    `int8_calibrate` records those scales (apply with
    mutable=['act_scales']).
    """
    batch_norm: bool = True
    train: bool = False
    embedding_size: int = 1024
    eps: float = 1e-8
    dtype: Any = jnp.float32
    int8: bool = False
    int8_all: bool = False
    int8_static: bool = False
    int8_calibrate: bool = False
    # conv1_1 as an explicit im2col contraction (layers.Im2colConv,
    # same 'f0' params): avoids XLA's Cin=3 lane padding — conv1_1
    # measured 9.77 ms/512 crops in context vs ~1.2 SoL (PERF.md)
    im2col_conv1: bool = False

    @nn.compact
    def __call__(self, x: Array, n_entries: Optional[int] = None) -> Array:
        """n_entries: profiling hook — stop after the plan's first n
        entries and return the raw activation's sum (scalar), so
        per-layer marginal costs can be measured as prefix deltas
        (scripts/profile_embed_layers_static.py). None = normal embed."""
        x = normalize_tanh_imagenet(x).astype(self.dtype)

        plan = _vgg_plan(self.batch_norm)
        # Split points: descriptor 1 after the last ReLU of block 4 (before
        # its pool), descriptor 2 after the last ReLU of block 5.
        pools_seen = 0
        conv_ordinal = 0
        done = 0
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
                int8_set = (INT8_ALL_CONVS if self.int8_all
                            else INT8_FAVORED_CONVS)
                if (self.int8 or self.int8_all) \
                        and conv_ordinal in int8_set:
                    x = Int8Conv(ch, dtype=self.dtype,
                                 static_scale=self.int8_static,
                                 calibrate=self.int8_calibrate,
                                 name=f"f{idx}")(x)
                elif conv_ordinal == 1 and self.im2col_conv1:
                    x = layers.Im2colConv(ch, kernel_size=3, strides=1,
                                          padding=1, use_bias=True,
                                          dtype=self.dtype,
                                          name=f"f{idx}")(x)
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
            done += 1
            if n_entries is not None and done >= n_entries:
                return jnp.sum(x.astype(jnp.float32))

        desc = jnp.concatenate([desc1, desc2], axis=1).astype(jnp.float32)
        norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        return desc / jnp.maximum(norm, self.eps)


# Embedder-facing name for the shared calibration helper: `model` must
# be a MACVGG constructed with int8/int8_all and `int8_calibrate=True`;
# the result feeds an `int8_static=True` twin (see models/quant.py).
calibrate_int8_scales = quant.calibrate_act_scales


def fold_bn_variables(variables):
    """Fold eval-mode BatchNorms into the preceding convs: MACVGG
    (batch_norm=True) variables -> MACVGG(batch_norm=False) variables.

    At inference BN is the affine y = (x - mean) / sqrt(var + eps) *
    gamma + beta, so conv->BN collapses into one conv with
    kernel' = kernel * s and bias' = (bias - mean) * s + beta where
    s = gamma / sqrt(var + eps) (per output channel). Exact to f32
    rounding, and removes 13 full-activation BN passes that XLA does
    not fuse on the early 256^2/128^2 blocks (measured: conv1_1+bn+relu
    at 8x the conv's speed-of-light, PERF.md r2 layer profile).

    Works for any checkpoint of the BN model (torchvision vgg16_bn or
    trained MACVGG); the result serves through the torchvision vgg16
    (no-BN) layer numbering. BN eps matches nn.BatchNorm's 1e-5.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    plan_bn = _vgg_plan(True)
    plan_plain = _vgg_plan(False)
    convs_bn = [idx for kind, idx, _ in plan_bn if kind == "conv"]
    bns = [idx for kind, idx, _ in plan_bn if kind == "bn"]
    convs_plain = [idx for kind, idx, _ in plan_plain if kind == "conv"]

    new_params = {}
    for c_bn, b_bn, c_pl in zip(convs_bn, bns, convs_plain):
        conv_p = params[f"f{c_bn}"]
        bn_p = params[f"f{b_bn}"]
        bn_s = stats[f"f{b_bn}"]
        s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
        kernel = conv_p["kernel"] * s
        bias = (conv_p.get("bias", 0.0) - bn_s["mean"]) * s + bn_p["bias"]
        new_params[f"f{c_pl}"] = {"kernel": kernel, "bias": bias}
    return {"params": new_params}


class EmbedFn:
    """Serving wrapper: a jitted `(B, 256, 256, 3) -> (B, D)` callable
    that also carries the int8 static-scale lifecycle.

    For `int8_static` models the activation scales must be calibrated
    before serving. The production flow (pipeline/classifier.py)
    calibrates on the gallery at index-build time and persists the
    scales with the saved index; if serving starts uncalibrated (e.g.
    an old index file), the first batch self-calibrates — scales are
    then frozen for the session, keeping embeddings reproducible.
    """

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._apply = jax.jit(model.apply)
        # MACVGG marks static int8 with int8_static; MACResNet (and the
        # detector models) with quant='static'
        self.needs_calibration = bool(
            getattr(model, "int8_static", False)
            or getattr(model, "quant", None) == "static")
        self._calibrated = not self.needs_calibration

    @property
    def embedding_size(self) -> int:
        return self.model.embedding_size

    def __call__(self, imgs: Array) -> Array:
        if not self._calibrated:
            self.calibrate([imgs])
        return self._apply(self.variables, imgs)

    def calibrate(self, batches) -> None:
        if getattr(self.model, "int8_static", False):
            cal = self.model.clone(int8_static=False, int8_calibrate=True)
        else:
            cal = self.model.clone(quant="calibrate")
        self.variables = calibrate_int8_scales(cal, self.variables,
                                               batches)
        self._calibrated = True

    def get_scales(self):
        """Per-layer act scales as a plain float tree (None if absent)."""
        scales = self.variables.get("act_scales")
        if scales is None:
            return None
        return jax.tree.map(float, scales)

    def set_scales(self, scales) -> None:
        v = dict(self.variables)
        v["act_scales"] = jax.tree.map(
            lambda s: jnp.asarray(s, jnp.float32), scales)
        self.variables = v
        self._calibrated = True


class MACResNet(nn.Module):
    """ResNet-50 MAC embedder over stage outputs.

    descriptor_stages are reference `descriptor_layers` + 1 in our stage
    naming (reference layers [2, 3] == stages c3, c4 -> 1536-d;
    cvpce/models/classification.py:55-77 indexes [stem, layer1..layer4]).

    `quant`: int8 MXU serving for the trunk stage convs (models/quant.py
    modes 'static'/'calibrate'/'dynamic'; stem stays in dtype) — same
    calibrate-then-serve lifecycle as MACVGG int8_static.
    """
    descriptor_stages: Sequence[str] = ("c3", "c4")
    train: bool = False
    eps: float = 1e-8
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @property
    def embedding_size(self) -> int:
        sizes = {"c1": 64, "c2": 256, "c3": 512, "c4": 1024, "c5": 2048}
        return sum(sizes[s] for s in self.descriptor_stages)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        feats = ResNet50(norm="batch", train=self.train, dtype=self.dtype,
                         quant=self.quant, name="trunk")(x)
        descs = [jnp.max(feats[s], axis=(1, 2)).astype(jnp.float32)
                 for s in self.descriptor_stages]
        desc = jnp.concatenate(descs, axis=1)
        norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        return desc / jnp.maximum(norm, self.eps)
