"""Per-layer timing of the int8-all-static MACVGG embed path + embed
chunk-size sweep + a pixels-on-lanes probe for the Cout=64 layers.

Motivation (PERF.md r2): int8_all_static embeds 512 crops in ~108 ms =
48% of the int8 speed-of-light (52 ms at 394 TOP/s). The per-layer
bf16-vs-int8-dynamic table showed conv1_2 at 131 TOP/s (33% peak) —
its Cout=64 fills only half the MXU's 128 lanes when XLA puts output
features on lanes. This script:

1. times each conv of the static-int8 path in isolation (marginal cost
   via cumulative prefixes — isolated single ops carry a ~3.6 ms
   dispatch floor through the tunnel, so prefix deltas are the honest
   per-layer number);
2. sweeps the embed chunk size (256 vs 512) for the full model;
3. probes a dot_general formulation of conv1_2 with PIXELS on the lane
   dimension ((Cout, 576) @ (576, Npix) per tile) vs the nn.Conv
   lowering, int8 and bf16 — to size the prize before committing to a
   Pallas fused block kernel.

Prints JSON lines; run on the real v5e (background, ~10 min compile).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_CROPS = 512
ITERS = 10


def fetch_scalar(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *args, iters=ITERS, warmup=2):
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


# ---------------------------------------------------------------- part 1
def per_layer_prefix_profile():
    """Marginal per-layer cost of the static-int8 embed stack via
    cumulative prefixes (chunked exactly like the bench: lax.map over
    256-crop chunks)."""
    from cvpce_tpu.models.embedders import (MACVGG, calibrate_int8_scales,
                                            _vgg_plan)

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.uniform(-1, 1, (N_CROPS, 256, 256, 3)).astype(np.float32))
    full = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                  int8_static=True)
    base = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    vars_ = base.init(jax.random.PRNGKey(1), crops[:8])
    cal = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                 int8_calibrate=True)
    vars_cal = calibrate_int8_scales(cal, vars_, [crops[:256]])

    # prefix k = run the plan's first k entries, then reduce-sum (scalar
    # out to defeat the tunnel fetch cost). Truncation via the module's
    # own plan would need model surgery; instead time cumulative slices
    # with nn.Module capture: full.apply with a capture_intermediates
    # filter is equally expensive, so rebuild the plan manually.
    plan = _vgg_plan(batch_norm=True)
    n_entries = len(plan)

    def prefix_fn(k):
        @jax.jit
        def f(v, c):
            ch = c.reshape(-1, 256, 256, 256, 3)
            return jnp.sum(jax.lax.map(
                lambda z: full.apply(v, z, n_entries=k), ch))
        return f

    # prefix points: after each conv's trailing relu only (each prefix
    # is its own slow remote compile; 13 instead of 44). A conv's
    # marginal then includes its bn+relu and any preceding pool.
    points = [k for k in range(1, n_entries + 1)
              if plan[k - 1][0] == "relu"]
    prev = 0.0
    for k in points:
        t = timeit(prefix_fn(k), vars_cal, crops)
        report(prefix=k, entry=str(plan[k - 1]), ms=round(t * 1000, 2),
               marginal_ms=round((t - prev) * 1000, 2))
        prev = t


# ---------------------------------------------------------------- part 2
def chunk_sweep():
    from cvpce_tpu.models.embedders import MACVGG, calibrate_int8_scales

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.uniform(-1, 1, (N_CROPS, 256, 256, 3)).astype(np.float32))
    full = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                  int8_static=True)
    base = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    vars_ = base.init(jax.random.PRNGKey(1), crops[:8])
    cal = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                 int8_calibrate=True)
    vars_cal = calibrate_int8_scales(cal, vars_, [crops[:256]])

    for chunk in (128, 256, 512):
        @jax.jit
        def f(v, c, chunk=chunk):
            ch = c.reshape(-1, chunk, 256, 256, 3)
            embs = jax.lax.map(lambda z: full.apply(v, z), ch)
            return jnp.sum(embs.astype(jnp.float32))
        try:
            t = timeit(f, vars_cal, crops)
            report(chunk=chunk, ms=round(t * 1000, 2),
                   crops_per_s=round(N_CROPS / t))
        except Exception as e:  # OOM at 512 is a finding, not a crash
            report(chunk=chunk, error=str(e)[-300:])


# ---------------------------------------------------------------- part 3
def pixels_on_lanes_probe():
    """conv1_2-shaped (256^2, 64->64) matmul two ways:
    (a) nn.Conv-equivalent lax.conv (what the model does today),
    (b) im2col dot_general with pixels on the minor/lane dim:
        (64, 576) @ (576, Npix). The im2col patches tensor is built by
        9 static slices of the padded input (XLA fuses these into the
        matmul operand without a 9x HBM blowup -- verify by timing).
    Both int8 (int32 accum) and bf16. B=32 crops is enough signal."""
    B, H, W, C = 32, 256, 256, 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)

    xq = jnp.clip(jnp.round(x * 127), -127, 127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(k * 127), -127, 127).astype(jnp.int8)

    @jax.jit
    def conv_bf16(x, k):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def conv_int8(x8, k8):
        out = jax.lax.conv_general_dilated(
            x8, k8, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.sum(out)

    def make_patches(xp):
        # xp: (B, H+2, W+2, C) -> (B, H, W, 9C) by 9 static slices
        slabs = [xp[:, dy:dy + H, dx:dx + W, :]
                 for dy in range(3) for dx in range(3)]
        return jnp.concatenate(slabs, axis=-1)

    @jax.jit
    def pixlane_bf16(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pat = make_patches(xp).astype(jnp.bfloat16)      # (B,H,W,576)
        km = k.reshape(9 * C, C).astype(jnp.bfloat16)    # (576, 64)
        # pixels on lanes: contract patches with kernel, output (B,C,H,W)
        out = jnp.einsum("bhwk,kc->bchw", pat, km)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def pixlane_int8(x8, k8):
        xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pat = make_patches(xp)                            # int8
        km = k8.reshape(9 * C, C)
        out = jax.lax.dot_general(
            pat, km, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (B,H,W,C)
        return jnp.sum(out)

    @jax.jit
    def pixlane_int8_t(x8, k8):
        # transposed orientation: (C, 576) @ (576, pixels)
        xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pat = make_patches(xp)                            # (B,H,W,576)
        pat = pat.reshape(B, H * W, 9 * C)
        km = k8.reshape(9 * C, C).T                       # (64, 576)
        out = jax.lax.dot_general(
            km, pat, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32)             # (64, B, HW)
        return jnp.sum(out)

    gflop = 2 * 9 * C * C * H * W * B / 1e9
    for name, fn, args in [
            ("conv_bf16", conv_bf16, (x, k)),
            ("conv_int8", conv_int8, (xq, kq)),
            ("pixlane_bf16", pixlane_bf16, (x, k)),
            ("pixlane_int8", pixlane_int8, (xq, kq)),
            ("pixlane_int8_t", pixlane_int8_t, (xq, kq))]:
        try:
            t = timeit(fn, *args)
            report(probe=name, ms=round(t * 1000, 3),
                   tflops=round(gflop / t / 1000, 1))
        except Exception as e:
            report(probe=name, error=str(e)[-300:])


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "layers"):
        per_layer_prefix_profile()
    if which in ("all", "chunk"):
        chunk_sweep()
    if which in ("all", "pixlane"):
        pixels_on_lanes_probe()
    report(name="DONE")
