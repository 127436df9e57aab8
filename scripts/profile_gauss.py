"""Gaussian-branch sublayer breakdown (detector bottleneck: 18.2 ms of
the 33.9 ms GLN forward at batch 4, but only ~316 GFLOP — something
structural). Cumulative timings: lateral -> +add/up(P3) -> +block1 ->
+block2 -> +up2 -> +subnet. Plus upsample variants and a thin-conv
space-to-depth probe. Prints JSON lines."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def report(name, sec=None, **kw):
    row = {"name": name, **kw}
    if sec is not None:
        row["ms"] = round(sec * 1000, 3)
    print(json.dumps(row), flush=True)


def guard(f):
    def wrapped(*a, **k):
        try:
            return f(*a, **k)
        except Exception:
            report(f.__name__, error=traceback.format_exc()[-500:])
    return wrapped


B, CH, CW = 4, 832, 1344


@guard
def cumulative():
    from cvpce_tpu.models.gln import GaussianBranch

    dt = jnp.bfloat16
    c2 = jnp.zeros((B, CH // 4, CW // 4, 256), jnp.float32)
    p3 = jnp.zeros((B, CH // 8, CW // 8, 256), jnp.float32)
    gb = GaussianBranch(dtype=dt)
    v = gb.init(jax.random.PRNGKey(0), c2[:1], p3[:1])

    @jax.jit
    def full(v, c2, p3):
        return jnp.sum(gb.apply(v, c2, p3))

    t = timeit(full, (v, c2, p3))
    report("gauss_full", t)

    # isolated pieces on matching shapes
    from cvpce_tpu.models.layers import upsample_nearest_2x
    from flax import linen as nn

    h2, w2 = CH // 4, CW // 4

    def piece(name, module_fn, x_shape):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return module_fn(x)
        m = M()
        x = jnp.zeros(x_shape, jnp.float32)
        mv = m.init(jax.random.PRNGKey(0), x[:1])

        @jax.jit
        def f(mv, x):
            return jnp.sum(m.apply(mv, x))
        t = timeit(f, (mv, x))
        report(name, t)

    dtb = jnp.bfloat16
    piece("lateral_1x1_256", lambda x: nn.Conv(256, (1, 1), dtype=dtb)(x),
          (B, h2, w2, 256))
    piece("block1_conv_256to128",
          lambda x: nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=dtb)(x), (B, h2, w2, 256))
    piece("block2_conv_128to64",
          lambda x: nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=dtb)(x), (B, h2, w2, 128))
    piece("upsample2x_64ch", upsample_nearest_2x, (B, h2, w2, 64))
    piece("subnet_conv_64to32",
          lambda x: nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=dtb)(x), (B, 2 * h2, 2 * w2, 64))
    piece("subnet_conv_32to32",
          lambda x: nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=dtb)(x), (B, 2 * h2, 2 * w2, 32))
    piece("subnet_conv_32to16",
          lambda x: nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=dtb)(x), (B, 2 * h2, 2 * w2, 32))
    piece("subnet_conv_16to16_1x1",
          lambda x: nn.Conv(16, (1, 1), dtype=dtb)(x),
          (B, 2 * h2, 2 * w2, 16))
    piece("bn_128", lambda x: nn.BatchNorm(use_running_average=True,
                                           dtype=dtb)(x), (B, h2, w2, 128))

    # space-to-depth probe: 64->32 3x3 at 416x672 == packed conv at
    # 208x336 with 4x channels (structured-zero kernel, exact semantics)
    def s2d_conv(x):
        b, hh, ww, c = x.shape
        xp = x.reshape(b, hh // 2, 2, ww // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2, 4 * c)
        y = nn.Conv(4 * 32, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=dtb)(xp)
        return y  # (would unpack to (b, hh, ww, 32) with depth-to-space)

    piece("subnet_64to32_s2d_equivFLOPx4", s2d_conv,
          (B, 2 * h2, 2 * w2, 64))


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    cumulative()
    print(json.dumps({"name": "DONE"}), flush=True)
