"""ResNet50 backbone marginal costs via single-jit prefixes (NEXT r3).

The detector-forward breakdown (PERF.md r2) puts the ResNet50-FrozenBN
trunk at 14.2 ms / batch 4 / 832x1344 bf16 = ~26 TFLOP/s (~13% of the
v5e's 197 bf16 peak) — the last single-chip lever VERDICT r2 #6 leaves
open. This script localizes the fat before any fix:

- per-stage marginal cost: jit a function returning a scalar reduction
  of c1..c5; XLA dead-code-eliminates the unused later stages, so
  successive differences are honest in-context marginals (the
  profile_gauss_prefix.py trick).
- analytic FLOPs per stage -> per-stage TFLOP/s, separating "stage is
  MXU-starved" (thin channels / small spatial) from "stage is
  bandwidth-bound" (1x1-heavy bottlenecks).
- FrozenBN in-context cost: norm='none' vs norm='frozen' at equal
  topology bounds what weight-folding could ever save (XLA should fuse
  the affine into the conv epilogue already).
- batch 8 prefixes: localize the detector's b8 sublinearity.

Params are jit ARGUMENTS (closure-captured device constants fail on the
axon tunnel); outputs are scalars (no D2H fetch in the timed loop).

Run: python scripts/profile_backbone.py [--batch 4] [--canvas 832 1344]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def stage_gflops(h: int, w: int, batch: int):
    """Analytic MAC*2 counts per stage at canvas (h, w).

    Spatial sizes: stem conv at h/2, layer1 at h/4, layer2 h/8,
    layer3 h/16, layer4 h/32 (stride-2 first block each, stem pool
    gives layer1 its h/4).
    """
    stages = {}
    stages["stem"] = 2 * 7 * 7 * 3 * 64 * (h // 2) * (w // 2)

    def bottleneck(cin, width, hw, stride, downsample):
        ho, wo = hw[0] // stride, hw[1] // stride
        f = 2 * cin * width * hw[0] * hw[1]              # 1x1 reduce
        f += 2 * 9 * width * width * ho * wo             # 3x3 (stride here)
        f += 2 * width * 4 * width * ho * wo             # 1x1 expand
        if downsample:
            f += 2 * cin * 4 * width * ho * wo           # 1x1 shortcut
        return f, (ho, wo)

    cfg = [("layer1", 3, 64, 1), ("layer2", 4, 128, 2),
           ("layer3", 6, 256, 2), ("layer4", 3, 512, 2)]
    hw = (h // 4, w // 4)
    cin = 64
    for name, blocks, width, stride in cfg:
        total = 0
        for b in range(blocks):
            f, hw_out = bottleneck(cin, width, hw, stride if b == 0 else 1,
                                   downsample=b == 0)
            total += f
            cin, hw = 4 * width, hw_out
        stages[name] = total
    return {k: v * batch / 1e9 for k, v in stages.items()}


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--batches", nargs="+", type=int, default=(4, 8))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--int8", action="store_true",
                    help="also profile int8-static per-stage prefixes")
    ap.add_argument("--folded-only", action="store_true",
                    help="skip the per-stage prefixes; run only the "
                         "folded-FBN + frozen-vs-none experiments")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvpce_tpu.models.resnet import ResNet50

    h, w = args.canvas
    report(platform=jax.devices()[0].platform, canvas=[h, w])

    model = ResNet50(norm="frozen", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

    taps = ["c1", "c2", "c3", "c4", "c5"]
    names = ["stem", "layer1", "layer2", "layer3", "layer4"]

    for batch in ([] if args.folded_only else args.batches):
        x = jnp.asarray(
            np.random.default_rng(0).random((batch, h, w, 3), np.float32),
            jnp.bfloat16)
        gf = stage_gflops(h, w, batch)

        prefix_ms = {}
        for tap in taps:
            def run(v, x, _tap=tap):
                feats = model.apply(v, x)
                return jnp.sum(feats[_tap].astype(jnp.float32))

            fn = jax.jit(run)
            prefix_ms[tap] = timeit(fn, variables, x, iters=args.iters)

        prev = 0.0
        cum_gf = 0.0
        for tap, name in zip(taps, names):
            marg = prefix_ms[tap] - prev
            prev = prefix_ms[tap]
            cum_gf += gf[name]
            report(batch=batch, stage=name, prefix_ms=round(prefix_ms[tap], 2),
                   marginal_ms=round(marg, 2), gflop=round(gf[name], 1),
                   tflops=round(gf[name] / max(marg, 1e-6), 1))
        report(batch=batch, stage="TOTAL", ms=round(prefix_ms["c5"], 2),
               gflop=round(cum_gf, 1),
               tflops=round(cum_gf / prefix_ms["c5"], 1))

    # int8-static per-stage prefixes (the bench's default detect
    # numerics): same taps under calibrated int8 convs. Per-stage
    # bf16-vs-int8 marginals say where quantization pays on the trunk
    # (r2 facts: int8 wins on wide convs, loses on thin ones) and what
    # the bandwidth-bound 1x1-heavy stages gain from halved act bytes.
    if args.int8 and not args.folded_only:
        from cvpce_tpu.models.quant import calibrate_act_scales

        batch = args.batches[0]
        x = jnp.asarray(
            np.random.default_rng(0).random((batch, h, w, 3), np.float32),
            jnp.bfloat16)
        cal_model = ResNet50(norm="frozen", dtype=jnp.bfloat16,
                             quant="calibrate")
        cal_vars = {**variables}
        cal_vars = calibrate_act_scales(cal_model, cal_vars, [x])
        q_model = ResNet50(norm="frozen", dtype=jnp.bfloat16,
                           quant="static")
        gf = stage_gflops(h, w, batch)
        prefix_ms = {}
        for tap in taps:
            def runq(v, x, _tap=tap):
                feats = q_model.apply(v, x)
                return jnp.sum(feats[_tap].astype(jnp.float32))

            prefix_ms[tap] = timeit(jax.jit(runq), cal_vars, x,
                                    iters=args.iters)
        prev = 0.0
        for tap, name in zip(taps, names):
            marg = prefix_ms[tap] - prev
            prev = prefix_ms[tap]
            report(batch=batch, variant="int8_static", stage=name,
                   prefix_ms=round(prefix_ms[tap], 2),
                   marginal_ms=round(marg, 2),
                   tflops=round(gf[name] / max(marg, 1e-6), 1))

    # Folded-FBN serving twin (models/resnet.py:fold_frozen_bn): exact
    # kernel/bias absorption of the FrozenBN affine. If XLA already
    # fuses the affine into the conv epilogue this ties frozen_ms; any
    # gap is realizable serving win.
    from cvpce_tpu.models.resnet import fold_frozen_bn

    batch = args.batches[0]
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), np.float32),
        jnp.bfloat16)
    # device_put: fold_frozen_bn returns numpy leaves, and numpy jit
    # args re-upload per call — through the tunnel that costs ~2 s/call
    # and swamps the measurement (r4 first run)
    folded_vars = jax.device_put(fold_frozen_bn(variables))
    folded_model = ResNet50(norm="none", conv_bias=True,
                            dtype=jnp.bfloat16)
    t_folded = timeit(
        jax.jit(lambda v, x: jnp.sum(
            folded_model.apply(v, x)["c5"].astype(jnp.float32))),
        folded_vars, x, iters=args.iters)
    report(batch=batch, experiment="folded_fbn_bf16",
           ms=round(t_folded, 2))
    if args.int8:
        from cvpce_tpu.models.quant import calibrate_act_scales

        cal_model = ResNet50(norm="frozen", dtype=jnp.bfloat16,
                             quant="calibrate")
        cal_vars = calibrate_act_scales(cal_model, {**variables}, [x])
        folded_q_vars = jax.device_put(fold_frozen_bn(cal_vars))
        folded_q = ResNet50(norm="none", conv_bias=True,
                            dtype=jnp.bfloat16, quant="static")
        t_folded_q = timeit(
            jax.jit(lambda v, x: jnp.sum(
                folded_q.apply(v, x)["c5"].astype(jnp.float32))),
            folded_q_vars, x, iters=args.iters)
        report(batch=batch, experiment="folded_fbn_int8_static",
               ms=round(t_folded_q, 2))

    # FrozenBN in-context cost: same topology without any norm layer.
    # Bounds what folding FBN into conv weights could ever save.
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), np.float32),
        jnp.bfloat16)
    model_nonorm = ResNet50(norm="none", dtype=jnp.bfloat16)
    v2 = model_nonorm.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

    def run_full(v, x, m):
        return jnp.sum(m.apply(v, x)["c5"].astype(jnp.float32))

    t_frozen = timeit(jax.jit(lambda v, x: run_full(v, x, model)),
                      variables, x, iters=args.iters)
    t_none = timeit(jax.jit(lambda v, x: run_full(v, x, model_nonorm)),
                    v2, x, iters=args.iters)
    report(batch=batch, experiment="frozen_bn_cost",
           frozen_ms=round(t_frozen, 2), none_ms=round(t_none, 2),
           fbn_overhead_ms=round(t_frozen - t_none, 2))
    report(name="DONE")


if __name__ == "__main__":
    main()
