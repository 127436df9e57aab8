"""Fused maxpool2x2->int8conv Pallas kernel (ops/conv_pallas.py) vs the
XLA pool+Int8Conv(static) composition, per VGG block-boundary site.

Sites (PERF.md r2 layer profile, ms per 512 crops, int8 SoL):
  pool1+conv2_1  (256^2, 64->128):  17.95 measured vs ~5.5 SoL
  pool2+conv3_1  (128^2, 128->256):  7.28 measured vs ~4   SoL
  pool3+conv4_1  (64^2,  256->512):  3.52 measured vs ~3   SoL

Prints JSON lines; run on the real v5e. Variables passed as jit args
(closure-captured device arrays fail materialization on the axon
tunnel), scalar outputs only.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = 128  # crops per call; x4 for the 512-crop convention


def fetch_scalar(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *args, iters=10, warmup=2):
    out = None
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


SITES = [
    ("pool1_conv2_1", 256, 64, 128),
    ("pool2_conv3_1", 128, 128, 256),
    ("pool3_conv4_1", 64, 256, 512),
]


def main():
    from cvpce_tpu.ops.conv_pallas import fused_pool_int8_conv

    rng = np.random.default_rng(0)

    @jax.jit
    def xla_site(x, kq, a_scale, scale, bias):
        xp = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID")
        xq = jnp.clip(jnp.round(xp.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, kq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
        return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))

    @jax.jit
    def fused_site(x, kq, a_scale, scale, bias):
        y = fused_pool_int8_conv(x, kq, a_scale, scale, bias,
                                 fuse_relu=True)
        return jnp.sum(y.astype(jnp.float32))

    for name, hw, cin, cout in SITES:
        x = jnp.asarray(rng.uniform(
            0, 3, (B, hw, hw, cin)).astype(np.float32)).astype(jnp.bfloat16)
        kq = jnp.asarray(rng.integers(
            -127, 128, (3, 3, cin, cout)).astype(np.int8))
        a_scale = jnp.float32(3.0 / 127.0)
        scale = jnp.asarray(
            rng.uniform(1e-4, 1e-3, cout).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

        r = {}
        for label, fn in (("xla", xla_site), ("fused", fused_site)):
            t = timeit(fn, x, kq, a_scale, scale, bias)
            r[label] = round(t * 1000 * 4, 2)  # per-512-crop ms
        report(site=name, xla_ms_512=r["xla"], fused_ms_512=r["fused"],
               speedup=round(r["xla"] / r["fused"], 2))


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    main()
    report(name="DONE")
