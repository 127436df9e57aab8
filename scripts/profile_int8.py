"""Precise int8-vs-bf16 conv microbench at VGG16-256 shapes.

Loops each conv K times INSIDE one jit (chained data dependency) so the
~2ms tunnel dispatch overhead amortizes away. Prints JSON lines.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16

# (H, W, Cin, Cout) of every VGG16 conv at 256x256 input, with multiplicity
VGG_SHAPES = [
    ("conv1_1", 256, 256, 3, 64, 1),
    ("conv1_2", 256, 256, 64, 64, 1),
    ("conv2_1", 128, 128, 64, 128, 1),
    ("conv2_2", 128, 128, 128, 128, 1),
    ("conv3_1", 64, 64, 128, 256, 1),
    ("conv3_x", 64, 64, 256, 256, 2),
    ("conv4_1", 32, 32, 256, 512, 1),
    ("conv4_x", 32, 32, 512, 512, 2),
    ("conv5_x", 16, 16, 512, 512, 3),
]
BATCH = 128


def timeit_fetch(fn, args, iters=3, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def bench_conv(name, h, w, cin, cout, mult):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (BATCH, h, w, cin)).astype(np.float32))
    wgt = jnp.asarray(
        rng.uniform(-0.05, 0.05, (3, 3, cin, cout)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    flops = BATCH * h * w * cin * cout * 9 * 2

    def run(conv_one, xin):
        # chain REPS applications; slice output back to Cin channels so
        # shapes stay fixed (or project if cout != cin)
        def body(i, acc):
            y = conv_one(acc)
            return (y[..., :cin] if cout >= cin
                    else jnp.tile(y, (1, 1, 1, cin // cout + 1))[..., :cin])
        return jax.lax.fori_loop(0, REPS, body, xin)

    @jax.jit
    def f_bf16(x, wgt):
        xb = x.astype(jnp.bfloat16)
        wb = wgt.astype(jnp.bfloat16)

        def conv_one(z):
            return jax.lax.conv_general_dilated(
                z, wb, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)
        return run(conv_one, xb).sum()

    t = timeit_fetch(f_bf16, (x, wgt)) / REPS
    print(json.dumps({"name": f"{name}_bf16", "ms": round(t * 1000, 3),
                      "tflops": round(flops / t / 1e12, 1),
                      "mult": mult}), flush=True)

    xq = jnp.clip(jnp.round(x * 127), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wgt / float(jnp.abs(wgt).max()) * 127), -127,
                  127).astype(jnp.int8)

    @jax.jit
    def f_int8(xq, wq):
        def conv_one(z):
            y = jax.lax.conv_general_dilated(
                z, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            # requantize to int8 (shift-scale), like a real quantized net
            y = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
            return (y[..., :cin] if cout >= cin
                    else jnp.tile(y, (1, 1, 1, cin // cout + 1))[..., :cin])
        return jax.lax.fori_loop(0, REPS, lambda i, z: conv_one(z), xq).astype(
            jnp.int32).sum()

    try:
        t = timeit_fetch(f_int8, (xq, wq)) / REPS
        print(json.dumps({"name": f"{name}_int8", "ms": round(t * 1000, 3),
                          "tops": round(flops / t / 1e12, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"name": f"{name}_int8",
                          "error": str(e)[-300:]}), flush=True)


def bench_big_matmul():
    """Roofline sanity with in-jit loop."""
    M = K = N = 4096
    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    aq = jnp.ones((M, K), jnp.int8)
    bq = jnp.ones((K, N), jnp.int8)
    f = 2 * M * K * N

    @jax.jit
    def mm16(a, b):
        def body(i, acc):
            return jax.lax.dot_general(
                acc, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, REPS, body, a).sum()

    t = timeit_fetch(mm16, (a, b)) / REPS
    print(json.dumps({"name": "matmul_bf16_4k_inloop",
                      "ms": round(t * 1000, 3),
                      "tflops": round(f / t / 1e12, 1)}), flush=True)

    @jax.jit
    def mm8(aq, bq):
        def body(i, acc):
            y = jax.lax.dot_general(acc, bq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, REPS, body, aq).astype(jnp.int32).sum()

    t = timeit_fetch(mm8, (aq, bq)) / REPS
    print(json.dumps({"name": "matmul_int8_4k_inloop",
                      "ms": round(t * 1000, 3),
                      "tops": round(f / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    bench_big_matmul()
    for row in VGG_SHAPES:
        bench_conv(*row)
    print(json.dumps({"name": "DONE"}), flush=True)
