"""Embed-stage optimization experiments (VERDICT r1 #2). Prints JSON lines.

Per-layer profile (profile_int8.py) showed MACVGG-256 embed is ~100% conv
time at ~63% overall MXU util; the slow layers are conv1_2 (36% peak,
N=64 half-width), conv2_2 (55%) and conv3_x (66%). Experiments here:
  A. chunking: lax.map chunks vs one 512 batch
  B. conv1_2 alternative lowerings (NCHW, im2col dot_general)
  C. full MACVGG hybrid int8 (int8 only for layers where it measured
     faster), incl. embedding agreement vs bf16
  D. MACResNet bf16 (serving alternative)
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_CROPS = 512


def fetch_scalar(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, args, iters=5, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def report(name, sec=None, **kw):
    row = {"name": name, **kw}
    if sec is not None:
        row["ms"] = round(sec * 1000, 3)
        row["crops_per_s"] = round(N_CROPS / sec)
    print(json.dumps(row), flush=True)


def guard(f):
    def wrapped(*a, **k):
        try:
            return f(*a, **k)
        except Exception:
            report(f.__name__, error=traceback.format_exc()[-600:])
    return wrapped


def make_crops():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(-1, 1, (N_CROPS, 256, 256, 3)).astype(
        np.float32))


@guard
def exp_chunking():
    from cvpce_tpu.models.embedders import MACVGG

    crops = make_crops()
    emb = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    vars_ = emb.init(jax.random.PRNGKey(1), crops[:8])

    for n in (128, 512):
        @jax.jit
        def f(c, n=n):
            ch = c.reshape(-1, n, 256, 256, 3)
            return jax.lax.map(lambda z: emb.apply(vars_, z), ch).sum()
        t = timeit(f, (crops,))
        report(f"macvgg_bf16_chunk{n}", t)


@guard
def exp_conv1_2_lowerings():
    rng = np.random.default_rng(0)
    B, H, W, C = 128, 256, 256, 64
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.uniform(-0.05, 0.05, (3, 3, C, C)).astype(
        np.float32)).astype(jnp.bfloat16)
    flops = B * H * W * C * C * 9 * 2
    REPS = 8

    def run_loop(conv_one, xin):
        return jax.lax.fori_loop(0, REPS, lambda i, z: conv_one(z), xin)

    dn_nhwc = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def f_nhwc(x, w):
        def conv_one(z):
            return jax.lax.conv_general_dilated(
                z, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn_nhwc,
                preferred_element_type=jnp.bfloat16)
        return run_loop(conv_one, x).sum()

    t = timeit(f_nhwc, (x, w)) / REPS
    report("conv1_2_nhwc", t, tflops=round(flops / t / 1e12, 1))

    xc = jnp.transpose(x, (0, 3, 1, 2))
    wc = jnp.transpose(w, (3, 2, 0, 1))  # OIHW
    dn_nchw = jax.lax.conv_dimension_numbers(
        xc.shape, wc.shape, ("NCHW", "OIHW", "NCHW"))

    @jax.jit
    def f_nchw(xc, wc):
        def conv_one(z):
            return jax.lax.conv_general_dilated(
                z, wc, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn_nchw,
                preferred_element_type=jnp.bfloat16)
        return run_loop(conv_one, xc).sum()

    t = timeit(f_nchw, (xc, wc)) / REPS
    report("conv1_2_nchw", t, tflops=round(flops / t / 1e12, 1))

    # im2col: 9 shifted (BHW, 64) x (64, 64) matmuls accumulated — lets
    # XLA pick pure-GEMM tilings instead of conv tilings
    @jax.jit
    def f_im2col(x, w):
        def conv_one(z):
            zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((B, H, W, C), jnp.bfloat16)
            for dy in range(3):
                for dx in range(3):
                    zs = jax.lax.dynamic_slice(zp, (0, dy, dx, 0),
                                               (B, H, W, C))
                    acc = acc + jax.lax.dot_general(
                        zs.reshape(-1, C), w[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.bfloat16,
                    ).reshape(B, H, W, C)
            return acc
        return run_loop(conv_one, x).sum()

    t = timeit(f_im2col, (x, w)) / REPS
    report("conv1_2_im2col", t, tflops=round(flops / t / 1e12, 1))

    # K-packed single GEMM: materialize the 9-tap patches once into
    # (BHW, 576) then one dot with (576, 64)
    @jax.jit
    def f_kpack(x, w):
        def conv_one(z):
            zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
            taps = [jax.lax.dynamic_slice(zp, (0, dy, dx, 0), (B, H, W, C))
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(taps, axis=-1).reshape(-1, 9 * C)
            return jax.lax.dot_general(
                patches, w.reshape(9 * C, C), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16).reshape(B, H, W, C)
        return run_loop(conv_one, x).sum()

    t = timeit(f_kpack, (x, w)) / REPS
    report("conv1_2_kpack", t, tflops=round(flops / t / 1e12, 1))


@guard
def exp_hybrid_int8():
    """Full MACVGG with int8 convs for the layers where int8 measured
    faster (conv1_2, conv2_2, conv3_*, conv5_*), bf16 elsewhere.
    Reports speed + embedding top-1 agreement vs the bf16 model."""
    from cvpce_tpu.models.embedders import MACVGG

    crops = make_crops()
    emb16 = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    vars16 = emb16.init(jax.random.PRNGKey(1), crops[:8])
    emb8 = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8=True)
    # same params — int8 quantization happens inside apply
    @jax.jit
    def f16(c):
        ch = c.reshape(-1, 128, 256, 256, 3)
        return jax.lax.map(lambda z: emb16.apply(vars16, z), ch)

    @jax.jit
    def f8(c):
        ch = c.reshape(-1, 128, 256, 256, 3)
        return jax.lax.map(lambda z: emb8.apply(vars16, z), ch)

    t = timeit(f16, (crops,))
    report("macvgg_bf16", t)
    t = timeit(f8, (crops,))
    report("macvgg_int8_hybrid", t)

    e16 = np.asarray(f16(crops)).reshape(N_CROPS, -1)
    e8 = np.asarray(f8(crops)).reshape(N_CROPS, -1)
    # retrieval agreement: NN of each int8 embedding within the bf16 set
    sims = e8 @ e16.T
    top1 = (np.argmax(sims, axis=1) == np.arange(N_CROPS)).mean()
    cos = (e16 * e8).sum(-1) / (
        np.linalg.norm(e16, axis=-1) * np.linalg.norm(e8, axis=-1) + 1e-9)
    report("int8_hybrid_agreement", top1_self_retrieval=float(top1),
           mean_cos=float(cos.mean()))


@guard
def exp_macresnet():
    from cvpce_tpu.models.embedders import MACResNet

    crops = make_crops()
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        emb = MACResNet(dtype=dtype)
        vars_ = emb.init(jax.random.PRNGKey(1), crops[:8])

        @jax.jit
        def f(c):
            ch = c.reshape(-1, 128, 256, 256, 3)
            return jax.lax.map(lambda z: emb.apply(vars_, z), ch).sum()

        t = timeit(f, (crops,))
        report(f"macresnet_{tag}", t)


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    exp_chunking()
    exp_conv1_2_lowerings()
    exp_macresnet()
    exp_hybrid_int8()
    print(json.dumps({"name": "DONE"}), flush=True)
