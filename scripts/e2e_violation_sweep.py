"""Violation-rate sweep for the composed compliance pipeline.

VERDICT r3 #5: the e2e validation sampled violation_rate in {0, 0.3}
only. This sweeps 0.1-0.5 (plus intact controls) over >=24 scenes with
the TRAINED serving artifacts, reporting the reference protocol's
aggregate (mean accuracy + MSE vs ground-truth accuracy,
cvpce/cli/eval.py:224-240) per rate, and attributing errors per
violation type via the comparator's per-slot found mask
(PlanogramComparator.compare_detailed):

- intact slot matched        -> correct
- removed/swapped slot NOT matched -> violation correctly flagged
- removed/swapped slot matched     -> violation MISSED (the second-
  chance reclassification can legitimately "find" a swapped slot's
  expected product only if classification errs, cvpce/production.py:
  101-115 — a true miss)

Run (TPU, gated):
  bash scripts/tpu_gate.sh -- python scripts/e2e_violation_sweep.py \
      --gln artifacts/gln_r3 --dihe artifacts/dihe_r3_triplet
"""
import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)  # for e2e_trained_pipeline imports

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gln", default="artifacts/gln_r3")
    ap.add_argument("--dihe", default="artifacts/dihe_r3_triplet")
    ap.add_argument("--embedder", choices=["dihe", "random"],
                    default="dihe")
    ap.add_argument("--rates", nargs="+", type=float,
                    default=[0.1, 0.2, 0.3, 0.4, 0.5])
    ap.add_argument("--scenes-per-rate", type=int, default=5)
    ap.add_argument("--intact-scenes", type=int, default=5)
    ap.add_argument("--products", type=int, default=12)
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--det-per-img", type=int, default=1000)
    ap.add_argument("--nms-candidates", type=int, default=5120)
    ap.add_argument("--seed", type=int, default=404)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from e2e_trained_pipeline import GallerySet, load_dihe_embedder
    from cvpce_tpu.data.synthetic import planogram_scene, product_styles
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.pipeline.calibrate import (resolve_input_norm,
                                              resolve_threshold)
    from cvpce_tpu.pipeline.classifier import Classifier
    from cvpce_tpu.pipeline.evaluator import (PlanogramComparator,
                                              PlanogramEvaluator)
    from cvpce_tpu.pipeline.proposals import ProposalGenerator
    from cvpce_tpu.pipeline.serving import load_gln_variables

    platform = jax.devices()[0].platform
    confidence = resolve_threshold("auto", args.gln)
    input_norm = resolve_input_norm(args.gln, default="raw01")
    report(platform=platform, gln=args.gln, embedder=args.embedder,
           confidence=round(confidence, 4), input_norm=input_norm,
           rates=args.rates, scenes_per_rate=args.scenes_per_rate)

    h, w = args.canvas
    cfg = GLNConfig(canvas_h=h, canvas_w=w,
                    max_nms_candidates=args.nms_candidates,
                    detections_per_img=args.det_per_img,
                    use_pallas_nms=platform not in ("cpu",))
    variables = load_gln_variables(args.gln)
    generator = ProposalGenerator(variables, cfg,
                                  confidence_threshold=confidence,
                                  input_norm=input_norm)
    styles = product_styles(args.products)
    gallery = GallerySet(styles)
    if args.embedder == "dihe":
        encoder_fn, emb_size = load_dihe_embedder(args.dihe, gallery)
    else:
        from cvpce_tpu.cli.common import load_embedder

        encoder_fn, emb_size = load_embedder(None, batch_norm=False)
    classifier = Classifier(encoder_fn, emb_size, gallery, batch_size=32)
    evaluator = PlanogramEvaluator(generator, classifier,
                                   PlanogramComparator())

    # scene list: intact controls at rate 0, then scenes_per_rate per rate
    jobs = [(0.0, i) for i in range(args.intact_scenes)]
    for r in args.rates:
        jobs += [(r, i) for i in range(args.scenes_per_rate)]

    per_rate = {}
    attribution = {"intact": [0, 0], "removed": [0, 0],
                   "swapped": [0, 0]}  # [judged_found, total]
    rows = []
    for vr, i in jobs:
        rng = np.random.default_rng((args.seed, int(vr * 100), i))
        img, plano, actual, expected = planogram_scene(
            h, w, styles, rng, violation_rate=vr)
        t0 = time.perf_counter()
        compliance, found, path = evaluator.evaluate_detailed(img, plano)
        dt = time.perf_counter() - t0
        err = compliance - expected
        per_rate.setdefault(vr, []).append((compliance, expected))
        row = {"rate": vr, "scene": i, "planned": len(plano["labels"]),
               "rendered": len(actual["labels"]),
               "compliance": round(float(compliance), 4),
               "expected": round(float(expected), 4),
               "err": round(float(err), 4), "path": path,
               "wall_s": round(dt, 2)}
        if found is not None:
            for kind, f in zip(plano["violations"], found):
                attribution[kind][0] += bool(f)
                attribution[kind][1] += 1
            row["found"] = int(np.sum(found))
        rows.append(row)
        report(**row)

    # reference protocol aggregate (cvpce/cli/eval.py:224-240): mean
    # accuracy + MSE vs ground truth, over all scenes and per rate
    comp = np.asarray([c for v in per_rate.values() for c, _ in v])
    exp = np.asarray([e for v in per_rate.values() for _, e in v])
    curve = {
        str(r): {
            "mean_compliance": round(float(np.mean([c for c, _ in v])), 4),
            "mean_expected": round(float(np.mean([e for _, e in v])), 4),
            "mean_abs_err": round(float(np.mean(
                [abs(c - e) for c, e in v])), 4),
            "mse": round(float(np.mean(
                [(c - e) ** 2 for c, e in v])), 5),
        }
        for r, v in sorted(per_rate.items())
    }
    # attribution: fraction of each slot type the pipeline judged
    # compliant ("found"). intact should be ~1; removed/swapped ~0.
    attr = {
        kind: {"judged_found": n, "total": t,
               "rate": round(n / t, 4) if t else None}
        for kind, (n, t) in attribution.items()
    }
    report(name="SUMMARY", scenes=len(rows),
           mean_accuracy=round(float(comp.mean()), 4),
           mean_expected=round(float(exp.mean()), 4),
           mse=round(float(np.mean((comp - exp) ** 2)), 5),
           mean_abs_err=round(float(np.mean(np.abs(comp - exp))), 4),
           curve=curve, attribution=attr)


if __name__ == "__main__":
    main()
    report(name="DONE")
