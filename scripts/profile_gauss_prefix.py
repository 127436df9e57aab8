"""Gaussian-branch marginal costs via single-jit prefixes.

The per-piece timings in profile_gauss.py each carry the ~3.6 ms
tunnel dispatch floor (their sum is ~47 ms vs 17.9 ms for the whole
branch in one jit), so per-layer attribution from them is mush. Here
every prefix of the branch runs as ONE jitted function; successive
differences are honest marginal costs. Also probes layout variants of
the full branch (NCHW dims, f32) to localize XLA lowering fat.

Params are jit arguments (closure-captured device constants fail on
the axon tunnel); outputs are scalars.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, CH, CW = 4, 832, 1344
H2, W2 = CH // 4, CW // 4  # 208, 336


def report(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1000


def conv(x, k, b, dims="NHWC"):
    if dims == "NHWC":
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        pad = [(k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2]
        y = jax.lax.conv_general_dilated(x, k, (1, 1), pad,
                                         dimension_numbers=dn)
        return y + b
    # NCHW: transpose in/out, OIHW kernel
    xn = x.transpose(0, 3, 1, 2)
    kn = k.transpose(3, 2, 0, 1)
    dn = jax.lax.conv_dimension_numbers(
        xn.shape, kn.shape, ("NCHW", "OIHW", "NCHW"))
    pad = [(k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2]
    y = jax.lax.conv_general_dilated(xn, kn, (1, 1), pad,
                                     dimension_numbers=dn)
    return y.transpose(0, 2, 3, 1) + b


def up2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


SPECS = [
    ("lateral", 1, 256, 256), ("block1", 3, 256, 128),
    ("block2", 3, 128, 64), ("subnet0", 3, 64, 32),
    ("subnet1", 3, 32, 32), ("subnet2", 3, 32, 16),
    ("subnet3", 1, 16, 16), ("subnet4", 1, 16, 1),
]


def make_params(dt):
    rng = np.random.default_rng(0)
    params = {}
    for name, k, cin, cout in SPECS:
        params[name] = (
            jnp.asarray(rng.standard_normal((k, k, cin, cout))
                        .astype(np.float32) * 0.05).astype(dt),
            jnp.asarray(rng.standard_normal((cout,))
                        .astype(np.float32) * 0.1).astype(dt),
        )
    return params


def branch(params, c2, p3, depth, dims="NHWC", fold_up=True):
    """depth: number of stages applied, 0 = lateral+add only."""
    x = conv(c2, *params["lateral"], dims) + up2(p3)
    stages = ["block1", "block2", "subnet0", "subnet1", "subnet2",
              "subnet3", "subnet4"]
    for i, name in enumerate(stages[:depth]):
        if name == "subnet0" and not fold_up:
            x = up2(x)
            x = jax.nn.relu(conv(x, *params[name], dims))
            continue
        if name == "subnet0":
            # folded up2->conv (models/gln.py:_FoldedUpConv semantics)
            k, b = params[name]
            c, o = k.shape[2], k.shape[3]
            folded = jnp.zeros((3, 3, c, 4 * o), k.dtype)
            for di in (0, 1):
                for dj in (0, 1):
                    slot = di * 2 + dj
                    for ky in range(3):
                        for kx in range(3):
                            pa = (di + ky - 1) // 2 + 1
                            pb = (dj + kx - 1) // 2 + 1
                            folded = folded.at[
                                pa, pb, :, slot * o:(slot + 1) * o
                            ].add(k[ky, kx])
            y = conv(x, folded, jnp.tile(b, 4), dims)
            bb, hh, ww, _ = y.shape
            y = y.reshape(bb, hh, ww, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
            x = jax.nn.relu(y.reshape(bb, hh * 2, ww * 2, o))
            continue
        x = jax.nn.relu(conv(x, *params[name], dims))
    return jnp.sum(x.astype(jnp.float32))


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(1)
    c2 = jnp.asarray(rng.standard_normal((B, H2, W2, 256))
                     .astype(np.float32)).astype(dt)
    p3 = jnp.asarray(rng.standard_normal((B, H2 // 2, W2 // 2, 256))
                     .astype(np.float32)).astype(dt)
    params = make_params(dt)

    import functools
    prev = 0.0
    for depth in range(8):
        f = jax.jit(functools.partial(branch, depth=depth))
        t = timeit(f, params, c2, p3)
        report(name=f"prefix_{depth}", ms=round(t, 2),
               marginal=round(t - prev, 2))
        prev = t

    for label, kw in [
        ("full_nchw", dict(depth=7, dims="NCHW")),
        ("full_unfolded_up", dict(depth=7, fold_up=False)),
    ]:
        f = jax.jit(functools.partial(branch, **kw))
        t = timeit(f, params, c2, p3)
        report(name=label, ms=round(t, 2))

    # f32 comparison
    params32 = make_params(jnp.float32)
    f = jax.jit(functools.partial(branch, depth=7))
    t = timeit(f, params32, c2.astype(jnp.float32),
               p3.astype(jnp.float32))
    report(name="full_f32", ms=round(t, 2))


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    main()
    report(name="DONE")
