"""Probe WHY int8 convs with Cin=64 underperform (conv2_1 at ~68-100
TOP/s vs conv2_2 at peak, PERF.md r2 layer profile): if the MXU pads
the int8 contraction to 32-sublane granularity irrespective of Cin,
Cin=64 should run at half the effective rate of Cin=128 at equal FLOPs.

Also checks whether XLA fuses a trailing 2x2 maxpool into the conv
(time conv vs conv+pool) — sizing a potential Pallas pool+conv fusion.

Prints JSON lines; run on the real v5e.
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


def fetch(out):
    np.asarray(jax.device_get(out)).ravel()[:1]


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def report(**kw):
    print(json.dumps(kw), flush=True)


def conv_int8(x8, k8, strides=(1, 1)):
    dn = jax.lax.conv_dimension_numbers(
        x8.shape, k8.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x8, k8, strides, [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    B = 64

    # equal-FLOP int8 convs, varying Cin at fixed Cout x spatial:
    # (H, Cin, Cout) with H^2*Cin constant
    cases = [
        ("cin32_h181", 180, 32, 128),
        ("cin64_h128", 128, 64, 128),   # conv2_1 shape class
        ("cin128_h90", 90, 128, 128),
        ("cin256_h64", 64, 256, 128),
        ("cin64_cout64_h128", 128, 64, 64),   # conv1_2 shape class
        ("cin128_cout64_h90", 90, 128, 64),
    ]
    for name, h, cin, cout in cases:
        x8 = jnp.asarray(rng.integers(-127, 127, (B, h, h, cin)),
                         jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)),
                         jnp.int8)

        @jax.jit
        def f(x, k):
            return jnp.sum(conv_int8(x, k))

        t = timeit(f, x8, k8)
        gflop = 2 * 9 * cin * cout * h * h * B / 1e9
        report(case=name, ms=round(t * 1000, 3),
               tops=round(gflop / t / 1000, 1))

    # conv -> maxpool fusion check (conv1_2 shape): does adding the pool
    # cost a full extra pass over the 256^2 map?
    h, cin, cout = 256, 64, 64
    x8 = jnp.asarray(rng.integers(-127, 127, (B, h, h, cin)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)

    @jax.jit
    def conv_only(x, k):
        return jnp.sum(conv_int8(x, k))

    @jax.jit
    def conv_relu_pool(x, k):
        y = nn.relu(conv_int8(x, k).astype(jnp.float32))
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return jnp.sum(y)

    t1 = timeit(conv_only, x8, k8)
    t2 = timeit(conv_relu_pool, x8, k8)
    report(case="conv1_2_like_conv_only", ms=round(t1 * 1000, 3))
    report(case="conv1_2_like_conv_relu_pool", ms=round(t2 * 1000, 3),
           pool_overhead_ms=round((t2 - t1) * 1000, 3))


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    main()
    report(name="DONE")
