"""Detector-forward breakdown on the real TPU. Prints JSON lines.

full_scalar profiling (profile_r2.py) showed the GLN forward is 33ms at
batch 4 (~21% MXU) — not "a few ms" as round 1 assumed. This isolates
backbone / FPN+heads / gaussian branch and tries batch scaling.

Variables are passed as jit ARGUMENTS (closure-captured device arrays
become MLIR constants, which the axon tunnel fails to materialize).
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


def report(name, sec=None, batch=4, **kw):
    row = {"name": name, **kw}
    if sec is not None:
        row["ms"] = round(sec * 1000, 3)
        row["img_per_s"] = round(batch / sec, 1)
    print(json.dumps(row), flush=True)


def guard(f):
    def wrapped(*a, **k):
        try:
            return f(*a, **k)
        except Exception:
            report(f.__name__, error=traceback.format_exc()[-500:])
    return wrapped


@guard
def run_batch(batch):
    from cvpce_tpu.models.fpn import FPN
    from cvpce_tpu.models.gln import (GLN, GLNConfig, GaussianBranch,
                                      RetinaNetHead)
    from cvpce_tpu.models.resnet import ResNet50

    config = GLNConfig(compute_dtype="bfloat16")
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (batch, config.canvas_h, config.canvas_w, 3)
    ).astype(np.float32))

    gln = GLN(config=config, train=False)
    gvars = gln.init(rng, images[:1])

    @jax.jit
    def full(v, imgs):
        out = gln.apply(v, imgs)
        return sum(jnp.sum(o) for o in jax.tree.leaves(out))

    t = timeit(full, (gvars, images))
    report(f"gln_fwd_b{batch}", t, batch=batch)

    body = ResNet50(norm="frozen", dtype=dt)
    bvars = body.init(rng, images[:1])

    @jax.jit
    def backbone(v, imgs):
        f = body.apply(v, imgs)
        return sum(jnp.sum(x) for x in f.values())

    t = timeit(backbone, (bvars, images))
    report(f"backbone_b{batch}", t, batch=batch)

    fpn = FPN(dtype=dt)
    head = RetinaNetHead(num_classes=1, dtype=dt)
    c = body.apply(bvars, images[:1])
    fpn_v = fpn.init(rng, c["c3"], c["c4"], c["c5"])
    pyr1 = fpn.apply(fpn_v, c["c3"], c["c4"], c["c5"])
    head_v = head.init(rng, pyr1)

    @jax.jit
    def no_gauss(bv, fv, hv, imgs):
        cc = body.apply(bv, imgs)
        pyr = fpn.apply(fv, cc["c3"], cc["c4"], cc["c5"])
        logits, regs = head.apply(hv, pyr)
        return jnp.sum(logits) + jnp.sum(regs)

    t = timeit(no_gauss, (bvars, fpn_v, head_v, images))
    report(f"no_gauss_b{batch}", t, batch=batch)

    gb = GaussianBranch(dtype=dt)
    c2 = jnp.zeros((batch, config.canvas_h // 4, config.canvas_w // 4,
                    256), jnp.float32)
    p3 = jnp.zeros((batch, config.canvas_h // 8, config.canvas_w // 8,
                    256), jnp.float32)
    gbv = gb.init(rng, c2[:1], p3[:1])

    @jax.jit
    def gauss_only(v, c2, p3):
        return jnp.sum(gb.apply(v, c2, p3))

    t = timeit(gauss_only, (gbv, c2, p3))
    report(f"gauss_branch_b{batch}", t, batch=batch)

    # heads alone on the real pyramid shapes (P6/P7 use ceil halving)
    shapes = [(104, 168), (52, 84), (26, 42), (13, 21), (7, 11)]
    pyr = [jnp.zeros((batch, hh, ww, 256), jnp.float32)
           for hh, ww in shapes]

    @jax.jit
    def heads_only(v, *p):
        logits, regs = head.apply(v, list(p))
        return jnp.sum(logits) + jnp.sum(regs)

    t = timeit(heads_only, (head_v, *pyr))
    report(f"heads_only_b{batch}", t, batch=batch)


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    run_batch(4)
    run_batch(8)
    print(json.dumps({"name": "DONE"}), flush=True)
