"""ResNet stem space-to-depth probe (NEXT.md #5).

The 7x7/stride-2/Cin=3 stem conv is the classic TPU lane-starvation
case (3 of 128 lanes). Space-to-depth packs 2x2 pixels into channels:
(B, H, W, 3) -> (B, H/2, W/2, 12), and the stem becomes an exact 4x4
stride-1 conv with kernel w4[a,b,dy*6+dx*3+c,o] = w[2a+dy-1,
2b+dx-1, c, o] (zeros where the source index leaves [0,6]), pad (2,1).
Measures baseline vs packed (including the pack transpose) at the
detector canvas and the MACResNet crop shape; checks exactness first.

Run on the real v5e. Params passed as jit args (tunnel constant
materialization), scalar outputs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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


def pack_kernel(w):
    """(7, 7, 3, O) -> (4, 4, 12, O) s2d-equivalent kernel."""
    o = w.shape[-1]
    w4 = np.zeros((4, 4, 12, o), np.float32)
    for a in range(4):
        for b in range(4):
            for dy in range(2):
                for dx in range(2):
                    ky, kx = 2 * a + dy - 1, 2 * b + dx - 1
                    if 0 <= ky < 7 and 0 <= kx < 7:
                        w4[a, b, dy * 6 + dx * 3:dy * 6 + dx * 3 + 3] = \
                            np.asarray(w[ky, kx])
    return jnp.asarray(w4)


def stem(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (2, 2), [(3, 3), (3, 3)],
                                        dimension_numbers=dn)


def stem_s2d(x, w4):
    b, h, wdt, c = x.shape
    xp = x.reshape(b, h // 2, 2, wdt // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, wdt // 2, 4 * c)
    dn = jax.lax.conv_dimension_numbers(xp.shape, w4.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xp, w4, (1, 1), [(2, 1), (2, 1)],
                                        dimension_numbers=dn)


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((7, 7, 3, 64)).astype(np.float32) * 0.05
    wj = jnp.asarray(w)
    w4 = pack_kernel(w)

    # exactness (small shape, f32)
    xs = jnp.asarray(rng.standard_normal((2, 64, 96, 3)).astype(np.float32))
    a = jax.jit(stem)(xs, wj)
    bb = jax.jit(stem_s2d)(xs, w4)
    err = float(jnp.max(jnp.abs(a - bb)))
    report(name="exactness_maxabs", err=err)
    assert err < 1e-4, err

    for label, shape in [("canvas_b4", (4, 832, 1344, 3)),
                         ("crops_b128", (128, 256, 256, 3))]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        f_base = jax.jit(lambda x, w: jnp.sum(stem(x, w)
                                              .astype(jnp.float32)))
        f_s2d = jax.jit(lambda x, w: jnp.sum(stem_s2d(x, w)
                                             .astype(jnp.float32)))
        t_base = timeit(f_base, x, wj.astype(jnp.bfloat16))
        t_s2d = timeit(f_s2d, x, w4.astype(jnp.bfloat16))
        report(name=label, base_ms=round(t_base, 3),
               s2d_ms=round(t_s2d, 3),
               speedup=round(t_base / t_s2d, 2))


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    main()
    report(name="DONE")
