"""Detector int8-static validation on TRAINED weights + speed check.

Two questions gate making int8 a detector serving option/default:
1. AP parity: does the quantized trunk/FPN/towers keep AP on the
   trained GLN (the 3000-step synthetic-shelves checkpoint, AP 0.889,
   reports/convergence_gln_r2_resumed.log)?
2. Speed: what does int8 do to the full-canvas (832x1344) forward that
   the bench measures?

Usage: python scripts/detector_int8_check.py [--ckpt /tmp/convergence_run]
Prints JSON lines (run on the real v5e; ~15 min of remote compiles).
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/convergence_run")
    ap.add_argument("--skip-speed", action="store_true")
    ap.add_argument("--skip-ap", action="store_true")
    ap.add_argument("--canvas", nargs=2, type=int, default=(256, 320),
                    help="AP-parity canvas — must match the checkpoint "
                         "(round-3 full-canvas run: 832 1344)")
    ap.add_argument("--det-per-img", type=int, default=256)
    ap.add_argument("--nms-candidates", type=int, default=1024)
    ap.add_argument("--scene-mix", choices=["shelf", "mixed"],
                    default="shelf",
                    help="AP-parity eval distribution; 'mixed' matches "
                         "the round-3 training mix (shelf + planogram)")
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cvpce_tpu.data.synthetic import SyntheticShelfDataset
    from cvpce_tpu.eval.proposals import (evaluate_gln,
                                          make_variables_inference_fn)
    from cvpce_tpu.models.gln import GLN, GLNConfig
    from cvpce_tpu.models.quant import calibrate_act_scales
    from cvpce_tpu.pipeline.serving import load_gln_variables

    platform = jax.devices()[0].platform
    report(platform=platform)

    # ---- AP parity on the trained checkpoint (its training canvas) ----
    if not args.skip_ap:
        h, w = args.canvas
        cfg = GLNConfig(canvas_h=h, canvas_w=w,
                        max_nms_candidates=args.nms_candidates,
                        detections_per_img=args.det_per_img,
                        use_pallas_nms=platform not in ("cpu",))
        variables = load_gln_variables(args.ckpt)

        shelves = (3, 5) if h <= 320 else (4, 8)
        trainset = SyntheticShelfDataset(8, h, w, seed=0,
                                         min_shelves=shelves[0],
                                         max_shelves=shelves[1])
        evalset = SyntheticShelfDataset(16, h, w, seed=10_000,
                                        min_shelves=shelves[0],
                                        max_shelves=shelves[1])
        if args.scene_mix == "mixed":
            from cvpce_tpu.data.synthetic import (
                InterleavedDataset, PlanogramSceneDetectionSet)

            evalset = InterleavedDataset(
                SyntheticShelfDataset(8, h, w, seed=10_000,
                                      min_shelves=shelves[0],
                                      max_shelves=shelves[1]),
                PlanogramSceneDetectionSet(8, h, w, seed=10_000,
                                           min_shelves=3,
                                           max_shelves=min(shelves[1], 5)))
        cal_imgs = jnp.asarray(np.stack(
            [trainset[i]["image"] for i in range(8)]))

        variants = {"f32": cfg,
                    "bf16": dataclasses.replace(
                        cfg, compute_dtype="bfloat16"),
                    "int8_static": dataclasses.replace(
                        cfg, compute_dtype="bfloat16", int8="static")}
        v_by_variant = {"f32": variables, "bf16": variables}
        cal_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                                      int8="calibrate")
        v_by_variant["int8_static"] = calibrate_act_scales(
            GLN(config=cal_cfg), variables, [cal_imgs[:4], cal_imgs[4:]])
        report(calibrated=len(jax.tree.leaves(
            v_by_variant["int8_static"]["act_scales"])))

        for name, vcfg in variants.items():
            infer_fn = make_variables_inference_fn(vcfg)
            t0 = time.time()
            res = evaluate_gln(v_by_variant[name], evalset, vcfg,
                               batch_size=args.batch_size,
                               infer_fn=infer_fn)
            r = res[0.5]
            report(variant=name, ap=round(float(r["ap"]), 4),
                   ar300=round(float(r["ar_300"]), 4),
                   f1=round(float(r["f"]), 4),
                   wall=round(time.time() - t0, 1))

    # ---- full-canvas forward speed (random weights, bench shape) ----
    if not args.skip_speed:
        cfg_full = GLNConfig(compute_dtype="bfloat16")
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0, 1, (4, 832, 1344, 3))
                           .astype(np.float32))
        base = GLN(config=cfg_full)
        vars_full = base.init(jax.random.PRNGKey(1), imgs[:1])
        cal_cfg = dataclasses.replace(cfg_full, int8="calibrate")
        v_cal = calibrate_act_scales(GLN(config=cal_cfg), vars_full,
                                     [imgs[:1]])

        for name, vcfg, v in [
                ("bf16", cfg_full, vars_full),
                ("int8_static",
                 dataclasses.replace(cfg_full, int8="static"), v_cal)]:
            model = GLN(config=vcfg)

            @jax.jit
            def fwd(vv, x, model=model):
                out = model.apply(vv, x)
                return (jnp.sum(out["cls_logits"].astype(jnp.float32)) +
                        jnp.sum(out["gaussians"].astype(jnp.float32)))

            for _ in range(2):
                fwd(v, imgs).block_until_ready()
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                out = fwd(v, imgs)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            report(speed=name, ms=round(dt * 1000, 2),
                   img_per_s=round(4 / dt, 1))

    report(name="DONE")


if __name__ == "__main__":
    main()
