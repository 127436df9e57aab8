"""Fused int8-DATAFLOW embed probe — measured NEGATIVE result.

Hypothesis: keeping activations int8 between convs (conv epilogues
write int8 directly, pools run on int8, MAC taps dequantize after the
spatial max) halves inter-layer HBM traffic vs the module int8-static
path, which dequantizes to bf16 after every conv.

Measured on v5e (512 crops, reports/profile_int8_fused_r2.log): the
fused path is ~11% SLOWER (95.7 vs 86.4 ms at chunk 128) with
embeddings matching (min cos 0.9998). Conclusion: XLA already fuses the
dequant->relu->requant elementwise chains into the conv fusions, and
int8-element outputs/pools lower worse than bf16 ones. The module path
stays the serving default; this script preserves the experiment.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from cvpce_tpu.models.embedders import _vgg_plan
from cvpce_tpu.models.layers import max_pool
from cvpce_tpu.ops.image import normalize_tanh_imagenet

N_CROPS = 512


def int8_fused_apply(variables, x, eps: float = 1e-8):
    """Fused int8-DATAFLOW MACVGG serving: activations stay int8
    between convs.

    The module path (MACVGG int8_all+int8_static) dequantizes every
    conv's int32 output to bf16, applies relu, and re-quantizes at the
    next conv — three full-activation bandwidth passes per edge. Here
    each conv's epilogue fuses dequant+bias+relu+REQUANT for the next
    conv's calibrated scale (elementwise, so XLA folds it into the conv
    fusion and the conv WRITES int8), max-pools run on int8 (max
    commutes exactly with the monotone quantization), and the two MAC
    descriptor taps dequantize after the spatial max (also exact).
    Numerics match the module path modulo the REMOVED intermediate
    bf16 rounding (tested: cos > 0.999).

    `variables`: {'params': folded no-BN MACVGG params,
    'act_scales': from calibrate_int8_scales on the
    MACVGG(batch_norm=False, int8_all=True) twin}. conv1_1 stays bf16
    (3-channel input). Returns L2-normalized (B, 1024) embeddings.
    """
    params = variables["params"]
    act_scales = variables["act_scales"]
    plan = _vgg_plan(False)
    conv_idxs = [idx for kind, idx, _ in plan if kind == "conv"]
    # per-conv activation scale (conv ordinal >= 2 quantize their input)
    s_of = {idx: act_scales[f"f{idx}"]["scale"] for idx in conv_idxs[1:]}
    # the int8 conv AFTER each plan position (None past conv5_3)
    next_conv_after = {}
    nxt = None
    for i in range(len(plan) - 1, -1, -1):
        next_conv_after[i] = nxt
        if plan[i][0] == "conv":
            nxt = plan[i][1]

    def quantize(v, s):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    x = normalize_tanh_imagenet(x).astype(jnp.bfloat16)
    xq = None          # int8 activation, scale s_cur (x ~= xq * s_cur)
    s_cur = None
    pending = None     # (y32, mult, bias) awaiting the relu entry
    pools_seen = 0
    conv_ord = 0
    desc1 = desc2 = None

    for i, (kind, idx, ch) in enumerate(plan):
        if kind == "conv":
            conv_ord += 1
            p = params[f"f{idx}"]
            if conv_ord == 1:
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, p["kernel"].shape, ("NHWC", "HWIO", "NHWC"))
                x = jax.lax.conv_general_dilated(
                    x, p["kernel"].astype(jnp.bfloat16), (1, 1),
                    [(1, 1), (1, 1)], dimension_numbers=dn)
                x = x + p["bias"].astype(jnp.bfloat16)
            else:
                s = s_of[idx]
                if xq is None:
                    xq = quantize(x.astype(jnp.float32), s)
                kernel = p["kernel"]
                w_scale = jnp.maximum(
                    jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
                kq = jnp.clip(jnp.round(kernel / w_scale), -127,
                              127).astype(jnp.int8)
                dn = jax.lax.conv_dimension_numbers(
                    xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
                y32 = jax.lax.conv_general_dilated(
                    xq, kq, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                pending = (y32, jnp.maximum(s, 1e-8) * w_scale, p["bias"])
                xq = None
        elif kind == "relu":
            if pending is None:       # conv1_1 block: plain bf16 relu
                x = nn.relu(x)
            else:
                y32, mult, bias = pending
                pending = None
                val = y32.astype(jnp.float32) * mult + bias
                nxt_idx = next_conv_after[i]
                if nxt_idx is not None:
                    # fused epilogue: relu + requant for the next conv —
                    # the conv writes int8 directly
                    s_next = jnp.maximum(s_of[nxt_idx], 1e-8)
                    xq = jnp.clip(jnp.round(
                        jnp.maximum(val, 0.0) / s_next), 0, 127
                    ).astype(jnp.int8)
                    s_cur = s_next
                    x = None
                else:                 # conv5_3: stay f32 for the tap
                    x = nn.relu(val)
        elif kind == "pool":
            pools_seen += 1
            if pools_seen == 4:
                # descriptor 1: spatial max commutes with dequant
                desc1 = (jnp.max(xq, axis=(1, 2)).astype(jnp.float32)
                         * s_cur) if xq is not None else \
                    jnp.max(x, axis=(1, 2)).astype(jnp.float32)
            if pools_seen == 5:
                desc2 = (jnp.max(xq, axis=(1, 2)).astype(jnp.float32)
                         * s_cur) if xq is not None else \
                    jnp.max(x, axis=(1, 2)).astype(jnp.float32)
                break
            if xq is not None:
                xq = max_pool(xq, 2, 2)
            else:
                x = max_pool(x, 2, 2)
                # quantize straight after the pool (pool output is 4x
                # smaller than the pre-pool map the requant would read)
                nxt_idx = next_conv_after[i]
                if nxt_idx is not None:
                    s_cur = jnp.maximum(s_of[nxt_idx], 1e-8)
                    xq = quantize(x.astype(jnp.float32), s_cur)
                    x = None

    desc = jnp.concatenate([desc1, desc2], axis=1)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    return desc / jnp.maximum(norm, eps)


def fetch_scalar(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def report(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from cvpce_tpu.models.embedders import (MACVGG, calibrate_int8_scales,
                                            fold_bn_variables)

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.uniform(-1, 1, (N_CROPS, 256, 256, 3)).astype(np.float32))
    bn_model = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    bn_vars = bn_model.init(jax.random.PRNGKey(1), crops[:8])
    folded = fold_bn_variables(bn_vars)
    cal = MACVGG(batch_norm=False, dtype=jnp.bfloat16, int8_all=True,
                 int8_calibrate=True)
    v_cal = calibrate_int8_scales(cal, folded, [crops[:128]])

    module = MACVGG(batch_norm=False, dtype=jnp.bfloat16, int8_all=True,
                    int8_static=True)
    variants = [("module_int8_static", module.apply),
                ("fused_int8_dataflow", int8_fused_apply)]
    embs = {}
    for name, apply_fn in variants:
        for chunk in (64, 128, 256):
            @jax.jit
            def f(vv, c, apply_fn=apply_fn, chunk=chunk):
                ch = c.reshape(-1, chunk, 256, 256, 3)
                embs = jax.lax.map(lambda z: apply_fn(vv, z), ch)
                return jnp.sum(embs.astype(jnp.float32))

            t = timeit(f, v_cal, crops)
            report(variant=name, chunk=chunk, ms=round(t * 1000, 2),
                   crops_per_s=round(N_CROPS / t))
        embs[name] = np.asarray(jax.jit(apply_fn)(v_cal, crops[:64]))

    a, b = embs.values()
    report(check="fused_vs_module_cos",
           min_cos=round(float((a * b).sum(-1).min()), 5))


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    main()
    report(name="DONE")
