"""Thin-Cin conv probes: explicit im2col vs XLA's padded-lane lowering.

The r4 trunk profile (PERF.md) shows the ResNet stem (7x7/s2, Cin=3) at
4.4 TFLOP/s — XLA pads the 3-channel contraction to the 128-lane MXU
width, a 42x FLOP waste — and MACVGG's conv1_1 (3x3/s1, Cin=3) pays the
same tax in the embed stage (9.77 ms/512 in context vs ~1.2 SoL).

Probe: build the im2col matrix with static strided slices + concat
(pure data movement XLA can fuse/pipeline), then contract K=147 (stem)
or K=27 (conv1_1) on the MXU at real utilization. Analytic cost at b4
832x1344: ~1.6 ms slice movement + ~0.3 ms matmul vs 4.74 measured.

Both variants are bit-checked against lax.conv before timing.

Run: python scripts/probe_stem_im2col.py [--cpu] [--iters 10]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=10, warmup=3):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1000


def conv_ref(x, w, stride, pad):
    import jax
    import jax.numpy as jnp

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn)


def conv_im2col(x, w, stride, pad):
    """im2col by static strided slices + one K=(kh*kw*cin) contraction."""
    import jax.numpy as jnp

    kh, kw, cin, cout = w.shape
    b, h, wd, _ = x.shape
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (wd + 2 * pad - kw) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [
        xp[:, dy:dy + (ho - 1) * stride + 1:stride,
           dx:dx + (wo - 1) * stride + 1:stride, :]
        for dy in range(kh) for dx in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)        # (b, ho, wo, kh*kw*cin)
    wk = jnp.transpose(w, (0, 1, 2, 3)).reshape(kh * kw * cin, cout)
    return jnp.einsum("bhwk,ko->bhwo", patches, wk,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def conv_tapsum(x, w, stride, pad):
    """Shift-and-accumulate: one stacked K-dim dot over (tap, cin)."""
    import jax.numpy as jnp

    kh, kw, cin, cout = w.shape
    b, h, wd, _ = x.shape
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (wd + 2 * pad - kw) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = jnp.stack([
        xp[:, dy:dy + (ho - 1) * stride + 1:stride,
           dx:dx + (wo - 1) * stride + 1:stride, :]
        for dy in range(kh) for dx in range(kw)
    ])                                               # (kh*kw, b, ho, wo, cin)
    wk = w.reshape(kh * kw, cin, cout)
    return jnp.einsum("tbhwc,tco->bhwo", taps, wk,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (numerics smoke)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    report(platform=jax.devices()[0].platform)
    rng = np.random.default_rng(0)

    if args.small:
        sites = [("stem7x7s2", (1, 64, 96, 3), (7, 7, 3, 64), 2, 3),
                 ("vgg_conv1_1", (2, 32, 32, 3), (3, 3, 3, 64), 1, 1)]
    else:
        sites = [("stem7x7s2", (4, 832, 1344, 3), (7, 7, 3, 64), 2, 3),
                 ("vgg_conv1_1", (512, 256, 256, 3), (3, 3, 3, 64), 1, 1)]

    for name, xshape, wshape, stride, pad in sites:
        x = jnp.asarray(rng.random(xshape, np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.1, wshape).astype(np.float32),
                        jnp.bfloat16)

        variants = {
            "xla_conv": conv_ref,
            "im2col_concat": conv_im2col,
            "tapsum_stack": conv_tapsum,
        }
        outs = {}
        for vname, fn in variants.items():
            jfn = jax.jit(functools.partial(fn, stride=stride, pad=pad))
            outs[vname] = np.asarray(
                jax.device_get(jfn(x, w))).astype(np.float32)
            ms = timeit(lambda xx, ww, _f=jfn: jnp.sum(
                _f(xx, ww).astype(jnp.float32)), x, w, iters=args.iters) \
                if not args.small else float("nan")
            report(site=name, variant=vname, ms=round(ms, 3)
                   if ms == ms else None)
        for vname in ("im2col_concat", "tapsum_stack"):
            err = np.max(np.abs(outs[vname] - outs["xla_conv"]))
            rel = err / max(np.max(np.abs(outs["xla_conv"])), 1e-9)
            report(site=name, variant=vname, max_abs_err=float(err),
                   max_rel=float(rel), ok=bool(rel < 2e-2))

    report(name="DONE")


if __name__ == "__main__":
    main()
