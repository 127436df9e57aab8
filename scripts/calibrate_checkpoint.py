"""Standalone serving-threshold calibration for a GLN checkpoint.

Runs the same max-F1 calibration train_convergence.py --calibrate does
at the end of training (pipeline/calibrate.py), but as its own TPU job
— for when a long training run is cut short at a plateau and the
rotating checkpoint is taken as final. Writes
<ckpt>/serving_calibration.json, the file every serving surface
(ProposalGenerator callers, e2e scripts, eval CLIs) reads via
resolve_threshold.

Run: python scripts/calibrate_checkpoint.py --ckpt checkpoints/gln_r3 \
       --canvas 832 1344 --det-per-img 1000 --nms-candidates 5120
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/repo/checkpoints/gln_r3")
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--det-per-img", type=int, default=1000)
    ap.add_argument("--nms-candidates", type=int, default=5120)
    ap.add_argument("--eval-n", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=20_000,
                    help="calibration-set seed (train_convergence.py "
                         "uses 20_000: held out from train seed 0 and "
                         "eval seed 10_000)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cvpce_tpu.data.synthetic import PlanogramSceneDetectionSet
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.pipeline.calibrate import (calibrate_confidence,
                                              save_calibration)
    from cvpce_tpu.pipeline.serving import load_gln_variables

    h, w = args.canvas
    platform = jax.devices()[0].platform
    print(json.dumps({"platform": platform, "ckpt": args.ckpt}),
          flush=True)

    model_cfg = GLNConfig(
        canvas_h=h, canvas_w=w, max_nms_candidates=args.nms_candidates,
        detections_per_img=args.det_per_img,
        use_pallas_nms=platform not in ("cpu",))
    variables = load_gln_variables(args.ckpt)

    # same held-out planogram-scene distribution the pipeline serves
    # (train_convergence.py plano_set: 3..5 shelves at full canvas)
    calset = PlanogramSceneDetectionSet(args.eval_n, h, w,
                                        seed=args.seed, min_shelves=3,
                                        max_shelves=5)
    # input_norm="raw01": the synthetic sets feed [0,1] images straight
    # to the model, so that is the preprocessing this checkpoint expects
    # at serving time (resolve_input_norm reads it back).
    cal = calibrate_confidence(
        variables, model_cfg, calset, batch_size=args.batch_size,
        input_norm="raw01")
    out = save_calibration(args.ckpt, cal)
    print(json.dumps({"calibration": cal, "written": out}), flush=True)
    print(json.dumps({"name": "DONE"}), flush=True)


if __name__ == "__main__":
    main()
