"""Int8 embed-path variants: dynamic vs calibrated-static activation
scales, hybrid vs all-conv int8 (NEXT.md perf item 3). Prints JSON lines.

The dynamic int8 path pays one extra full-tensor abs-max reduction pass
per quantized conv (10 layers x up-to-1GB activations); static scales
remove it and also remove the reduce->quantize serialization. With
static scales the "near-peak bf16" layers (conv2_1/conv4_1) may also
flip to int8 — hence the all-conv variant.
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
CHUNK = 256


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


def main():
    from cvpce_tpu.models.embedders import MACVGG, calibrate_int8_scales

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.uniform(-1, 1, (N_CROPS, 256, 256, 3)).astype(np.float32))

    base = MACVGG(batch_norm=True, dtype=jnp.bfloat16)
    vars_ = base.init(jax.random.PRNGKey(1), crops[:8])

    # calibrate once on one chunk (scale values don't affect speed)
    cal = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                 int8_calibrate=True)
    vars_cal = calibrate_int8_scales(cal, vars_, [crops[:CHUNK]])

    variants = [
        ("bf16", MACVGG(batch_norm=True, dtype=jnp.bfloat16), vars_),
        ("int8_hybrid_dyn",
         MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8=True), vars_),
        ("int8_hybrid_static",
         MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8=True,
                int8_static=True), vars_cal),
        ("int8_all_dyn",
         MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True), vars_),
        ("int8_all_static",
         MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                int8_static=True), vars_cal),
    ]

    embs = {}
    for name, model, mvars in variants:
        try:
            @jax.jit
            def f(v, c, model=model):
                ch = c.reshape(-1, CHUNK, 256, 256, 3)
                return jax.lax.map(lambda z: model.apply(v, z), ch)

            t = timeit(f, (mvars, crops))
            report(name, t)
            embs[name] = np.asarray(f(mvars, crops)).reshape(N_CROPS, -1)
        except Exception:
            report(name, error=traceback.format_exc()[-600:])

    ref = embs.get("bf16")
    if ref is not None:
        for name, e in embs.items():
            if name == "bf16":
                continue
            sims = e @ ref.T
            top1 = float((np.argmax(sims, axis=1) == np.arange(N_CROPS))
                         .mean())
            cos = float((e * ref).sum(-1).mean())
            report(f"{name}_fidelity", top1_self_retrieval=top1,
                   mean_cos=round(cos, 6))


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    main()
    print(json.dumps({"name": "DONE"}), flush=True)
