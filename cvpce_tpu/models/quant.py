"""Int8 MXU conv path shared by the embedder and the detector.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOP/s peak). The
serving recipe that measured fastest (PERF.md r2): per-OUTPUT-channel
weight quantization + per-tensor activation quantization with
CALIBRATED STATIC scales (a dynamic abs-max per batch costs one extra
full-tensor reduction pass per layer and serializes
reduce->quantize->matmul; static scales remove both). int32 accumulate,
f32 dequant epilogue.

Param names/shapes match nn.Conv ('kernel' HWIO + optional 'bias'), so
f32/bf16 checkpoints load unchanged — quantization happens at apply
time. Activation scales live in the separate 'act_scales' variable
collection: record them with `calibrate=True` (apply with
mutable=['act_scales']) via `calibrate_act_scales`, then serve with
`static_scale=True`.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class Int8Conv(nn.Module):
    """Quantized drop-in for nn.Conv (NHWC x HWIO).

    Modes: dynamic (default) computes the activation scale as the
    batch abs-max each call; `static_scale=True` reads the calibrated
    per-layer scale from 'act_scales'; `calibrate=True` keeps dynamic
    behavior and records the running max into 'act_scales'.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    static_scale: bool = False
    calibrate: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        sv = None
        if self.static_scale or self.calibrate:
            sv = self.variable("act_scales", "scale",
                               lambda: jnp.zeros((), jnp.float32))
        xf = x.astype(jnp.float32)
        if self.static_scale and not self.calibrate \
                and not self.is_initializing():
            a_scale = jnp.maximum(sv.value, 1e-8)
        else:
            a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
            if sv is not None and not self.is_initializing():
                sv.value = jnp.maximum(sv.value, a_scale)
        xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                              1e-8) / 127.0
        kq = jnp.clip(jnp.round(kernel / w_scale), -127,
                      127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, kq, self.strides, list(self.padding),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (a_scale * w_scale)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def calibrate_act_scales(model: nn.Module, variables, batches,
                         **apply_kwargs):
    """Record per-layer int8 activation scales for static-scale serving.

    `model` must be constructed with its int8 convs in `calibrate` mode.
    Runs each batch, keeping the running max of every Int8Conv's
    per-tensor activation scale. Returns `variables` augmented with the
    resulting 'act_scales' collection, ready for a `static_scale` twin
    of the same model.
    """
    @jax.jit
    def step(vars_, batch):
        _, mut = model.apply(vars_, batch, mutable=["act_scales"],
                             **apply_kwargs)
        return mut["act_scales"]

    scales = None
    for batch in batches:
        vars_ = dict(variables)
        if scales is not None:
            vars_["act_scales"] = scales
        scales = step(vars_, batch)
    out = dict(variables)
    out["act_scales"] = scales
    return out


def qconv(features: int, kernel: int, strides: int = 1,
          use_bias: bool = False, name: Optional[str] = None,
          padding: Optional[int] = None, dtype=jnp.bfloat16,
          quant: str = "static",
          kernel_init: Any = nn.initializers.lecun_normal(),
          bias_init: Any = nn.initializers.zeros) -> Int8Conv:
    """Int8 twin of models.layers.conv (torch-style symmetric padding).

    quant: 'static' (serve with calibrated scales), 'calibrate' (record
    scales), 'dynamic' (per-batch abs-max).
    """
    if padding is None:
        padding = kernel // 2
    return Int8Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(strides, strides),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        static_scale=quant == "static",
        calibrate=quant == "calibrate",
        kernel_init=kernel_init,
        bias_init=bias_init,
    )
