"""Round-2 perf experiments on the real TPU. Prints JSON lines.

Run: python scripts/profile_r2.py > /tmp/profile_r2.log 2>&1
Batches every experiment into one process (remote compile is per-process).
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


def _force(out):
    """block_until_ready through the axon tunnel does not actually wait;
    a host fetch does. Fetch one scalar-ish leaf."""
    leaves = jax.tree.leaves(out)
    for leaf in leaves:
        np.asarray(jax.device_get(leaf)).ravel()[:1]
    return out


def timeit(fn, args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def report(name, sec, **kw):
    print(json.dumps({"name": name, "ms": round(sec * 1000, 3), **kw}),
          flush=True)


def guard(name):
    def deco(f):
        def wrapped(*a, **k):
            try:
                return f(*a, **k)
            except Exception:
                print(json.dumps({"name": name, "error":
                                  traceback.format_exc()[-800:]}), flush=True)
        return wrapped
    return deco


# ---------------------------------------------------------------- int8 conv
@guard("int8_microbench")
def int8_conv_microbench():
    """Single conv layer: bf16 conv vs int8 (s8 x s8 -> s32), two lowerings:
    native lax.conv, and 9-shifted-matmul decomposition."""
    rng = np.random.default_rng(0)
    B, H, W, C = 128, 64, 64, 256  # conv3_2-like block
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.05, 0.05, (3, 3, C, C)).astype(np.float32))

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(x, w):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return out.sum()

    t = timeit(conv_bf16, (x, w))
    flops = B * H * W * C * C * 9 * 2
    report("conv_bf16", t, tflops=round(flops / t / 1e12, 1))

    xq = jnp.clip(jnp.round(x * 127), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w / jnp.abs(w).max() * 127), -127,
                  127).astype(jnp.int8)

    @jax.jit
    def conv_int8_native(xq, wq):
        out = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return out.sum()

    try:
        t = timeit(conv_int8_native, (xq, wq))
        report("conv_int8_native", t, tops=round(flops / t / 1e12, 1))
    except Exception:
        print(json.dumps({"name": "conv_int8_native", "error":
                          traceback.format_exc()[-400:]}), flush=True)

    @jax.jit
    def conv_int8_shifted(xq, wq):
        # pad H, W by 1; 9 shifted (BHW, C) x (C, C) int8 matmuls
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, C), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
                acc = acc + jax.lax.dot_general(
                    xs.reshape(-1, C), wq[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).reshape(B, H, W, C)
        return acc.sum()

    try:
        t = timeit(conv_int8_shifted, (xq, wq))
        report("conv_int8_shifted", t, tops=round(flops / t / 1e12, 1))
    except Exception:
        print(json.dumps({"name": "conv_int8_shifted", "error":
                          traceback.format_exc()[-400:]}), flush=True)

    # pure int8 matmul roofline check
    M = K = N = 4096
    aq = jnp.ones((M, K), jnp.int8)
    bq = jnp.ones((K, N), jnp.int8)
    a16 = jnp.ones((M, K), jnp.bfloat16)
    b16 = jnp.ones((K, N), jnp.bfloat16)

    @jax.jit
    def mm_int8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32).sum()

    @jax.jit
    def mm_bf16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).sum()

    f = 2 * M * K * N
    t = timeit(mm_bf16, (a16, b16), iters=20)
    report("matmul_bf16_4k", t, tflops=round(f / t / 1e12, 1))
    t = timeit(mm_int8, (aq, bq), iters=20)
    report("matmul_int8_4k", t, tops=round(f / t / 1e12, 1))


# ------------------------------------------------------------- embed stage
@guard("embed_variants")
def embed_variants():
    from cvpce_tpu.models.embedders import MACVGG

    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.uniform(-1, 1, (512, 256, 256, 3)).astype(
        np.float32))

    emb = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    vars_ = emb.init(jax.random.PRNGKey(1), crops[:8])

    def chunked(c, n):
        ch = c.reshape(-1, n, 256, 256, 3)
        return jax.lax.map(lambda z: emb.apply(vars_, z), ch)

    for n in (128, 256, 512):
        @jax.jit
        def f(c, n=n):
            return chunked(c, n).sum()
        t = timeit(f, (crops,), iters=5)
        report(f"embed_bf16_chunk{n}_scalar_out", t,
               crops_per_s=round(512 / t))

    # full output (what bench.py fetches through the tunnel)
    @jax.jit
    def f_full(c):
        return chunked(c, 128)
    t = timeit(f_full, (crops,), iters=5)
    report("embed_bf16_chunk128_full_out", t, crops_per_s=round(512 / t))


# ---------------------------------------------------- full pipeline stages
@guard("pipeline_stages")
def pipeline_stages():
    from cvpce_tpu.models.embedders import MACVGG
    from cvpce_tpu.models.gln import GLN, GLNConfig, postprocess_detections
    from cvpce_tpu.ops.image import crop_resize_square_mxu, scale_to_tanh

    config = GLNConfig(compute_dtype="bfloat16", use_pallas_nms=True,
                       use_approx_topk=True)
    batch, cpi = 4, 128
    rng = jax.random.PRNGKey(0)
    gln = GLN(config=config, train=False)
    images = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (batch, config.canvas_h, config.canvas_w, 3)).astype(
            np.float32))
    gln_vars = gln.init(rng, images)
    anchors, counts = config.anchors()
    anchors_j = jnp.asarray(anchors)
    sizes = jnp.full((batch, 2), 0, jnp.float32).at[:, 0].set(
        config.canvas_h).at[:, 1].set(config.canvas_w)
    embedder = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    emb_vars = embedder.init(jax.random.PRNGKey(1),
                             jnp.zeros((8, 256, 256, 3)))

    @jax.jit
    def fwd_only(imgs):
        outputs = gln.apply(gln_vars, imgs)
        return sum(jnp.sum(o) for o in jax.tree.leaves(outputs))

    @jax.jit
    def fwd_post(imgs):
        outputs = gln.apply(gln_vars, imgs)
        res = postprocess_detections(outputs, anchors_j, counts, sizes,
                                     config)
        return res["boxes"].sum() + res["scores"].sum()

    @jax.jit
    def fwd_post_crop(imgs):
        outputs = gln.apply(gln_vars, imgs)
        res = postprocess_detections(outputs, anchors_j, counts, sizes,
                                     config)
        top_boxes = res["boxes"][:, :cpi]
        crops = jax.vmap(crop_resize_square_mxu)(imgs, top_boxes)
        return scale_to_tanh(crops).sum()

    @jax.jit
    def full_scalar(imgs):
        outputs = gln.apply(gln_vars, imgs)
        res = postprocess_detections(outputs, anchors_j, counts, sizes,
                                     config)
        top_boxes = res["boxes"][:, :cpi]
        crops = jax.vmap(crop_resize_square_mxu)(imgs, top_boxes)
        crops = scale_to_tanh(crops).reshape(batch * cpi, 256, 256, 3)
        chunked = crops.reshape(-1, 128, 256, 256, 3)
        embs = jax.lax.map(lambda c: embedder.apply(emb_vars, c), chunked)
        return embs.sum() + res["boxes"].sum()

    @jax.jit
    def full_fetch(imgs):
        outputs = gln.apply(gln_vars, imgs)
        res = postprocess_detections(outputs, anchors_j, counts, sizes,
                                     config)
        top_boxes = res["boxes"][:, :cpi]
        crops = jax.vmap(crop_resize_square_mxu)(imgs, top_boxes)
        crops = scale_to_tanh(crops).reshape(batch * cpi, 256, 256, 3)
        chunked = crops.reshape(-1, 128, 256, 256, 3)
        embs = jax.lax.map(lambda c: embedder.apply(emb_vars, c), chunked)
        return res["boxes"], res["scores"], embs

    for name, f in [("fwd_only", fwd_only), ("fwd_post", fwd_post),
                    ("fwd_post_crop", fwd_post_crop),
                    ("full_scalar", full_scalar)]:
        t = timeit(f, (images,), iters=10)
        report(name, t, img_per_s=round(batch / t, 1))

    t = timeit(full_fetch, (images,), iters=10)
    report("full_fetch_outputs", t, img_per_s=round(batch / t, 1))


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    int8_conv_microbench()
    embed_variants()
    pipeline_stages()
    print(json.dumps({"name": "DONE"}), flush=True)
