"""Measure serving-time BN folding (fold_bn_variables): BN-model vs
folded no-BN model, bf16 and int8-static, chunks 128/256. Follows the
PERF.md r2 layer profile that showed the early blocks paying unfused
BN bandwidth (conv1_1+bn+relu at 8x the conv's speed-of-light).

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

N_CROPS = 512


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


def main():
    from cvpce_tpu.models.embedders import (MACVGG, calibrate_int8_scales,
                                            fold_bn_variables)

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.uniform(-1, 1, (N_CROPS, 256, 256, 3)).astype(np.float32))
    bn_model = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    bn_vars = bn_model.init(jax.random.PRNGKey(1), crops[:8])
    folded_vars = fold_bn_variables(bn_vars)

    def cal(model, v):
        c = model.clone(int8_static=False, int8_calibrate=True)
        return calibrate_int8_scales(c, v, [crops[:128]])

    variants = []
    m = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
               int8_static=True)
    variants.append(("bn_int8_static", m, cal(m, bn_vars)))
    m = MACVGG(batch_norm=False, dtype=jnp.bfloat16, int8_all=True,
               int8_static=True)
    variants.append(("folded_int8_static", m, cal(m, folded_vars)))
    variants.append(("bn_bf16",
                     MACVGG(batch_norm=True, dtype=jnp.bfloat16), bn_vars))
    variants.append(("folded_bf16",
                     MACVGG(batch_norm=False, dtype=jnp.bfloat16),
                     folded_vars))

    for name, model, v in variants:
        for chunk in (128, 256):
            @jax.jit
            def f(vv, c, model=model, chunk=chunk):
                ch = c.reshape(-1, chunk, 256, 256, 3)
                embs = jax.lax.map(lambda z: model.apply(vv, z), ch)
                return jnp.sum(embs.astype(jnp.float32))

            t = timeit(f, v, crops)
            report(variant=name, chunk=chunk, ms=round(t * 1000, 2),
                   crops_per_s=round(N_CROPS / t))


if __name__ == "__main__":
    report(devices=[str(d) for d in jax.devices()])
    main()
    report(name="DONE")
