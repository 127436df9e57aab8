"""Qualitative detection render for a trained GLN checkpoint.

VERDICT r2 #5 asks for the trained-weights qualitative check on the
full-canvas r3 checkpoint (the r2 analogue is reports/detect_trained_r2.png).
Renders held-out synthetic scenes (one shelf scene at SKU-110K-like
density, one planogram scene), runs the production ProposalGenerator at
the calibrated serving threshold (pipeline/calibrate.py), and saves box
overlays + a JSON line per scene with recall/precision vs rendered gt.

Run on the real chip: python scripts/render_detections.py
  [--ckpt checkpoints/gln_r3] [--out reports/detect_trained_r3]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def greedy_recall(gt: np.ndarray, det: np.ndarray, thr: float = 0.5):
    """(recall, precision), one-to-one greedy IoU matching (same
    protocol as scripts/e2e_trained_pipeline.py)."""
    if not len(gt) or not len(det):
        return 0.0, 0.0
    tl = np.maximum(gt[:, None, :2], det[None, :, :2])
    br = np.minimum(gt[:, None, 2:], det[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_g = np.prod(gt[:, 2:] - gt[:, :2], axis=-1)
    area_d = np.prod(det[:, 2:] - det[:, :2], axis=-1)
    m = inter / (area_g[:, None] + area_d[None, :] - inter + 1e-9)
    used = np.zeros(len(det), bool)
    hit = 0
    for i in np.argsort(-m.max(axis=1)):
        for j in np.argsort(-m[i]):
            if m[i, j] < thr:
                break
            if not used[j]:
                used[j] = True
                hit += 1
                break
    return hit / max(1, len(gt)), hit / max(1, len(det))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/repo/checkpoints/gln_r3")
    ap.add_argument("--out", default="/root/repo/reports/detect_trained_r3")
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    ap.add_argument("--det-per-img", type=int, default=1000)
    ap.add_argument("--nms-candidates", type=int, default=5120)
    ap.add_argument("--confidence", default="auto")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cvpce_tpu.data.synthetic import (planogram_scene, product_styles,
                                          shelf_scene)
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.pipeline.calibrate import (resolve_input_norm,
                                              resolve_threshold)
    from cvpce_tpu.pipeline.proposals import ProposalGenerator
    from cvpce_tpu.pipeline.serving import load_gln_variables
    from cvpce_tpu.utils.viz import save_boxes

    h, w = args.canvas
    confidence = resolve_threshold(args.confidence, args.ckpt)
    input_norm = resolve_input_norm(args.ckpt, default="raw01")
    report(platform=jax.devices()[0].platform, ckpt=args.ckpt,
           confidence=round(confidence, 4), input_norm=input_norm)

    cfg = GLNConfig(canvas_h=h, canvas_w=w,
                    max_nms_candidates=args.nms_candidates,
                    detections_per_img=args.det_per_img,
                    use_pallas_nms=jax.devices()[0].platform != "cpu")
    gen = ProposalGenerator(
        load_gln_variables(args.ckpt), cfg,
        confidence_threshold=confidence, input_norm=input_norm)

    # held-out seeds: disjoint from training ((2, epoch, i) streams) and
    # from the e2e validation ((41, i))
    styles = product_styles(12)
    scenes = {
        "shelf": shelf_scene(h, w, np.random.default_rng((97, 0))),
        "planogram": None,
    }
    img, _, actual, _ = planogram_scene(h, w, styles,
                                        np.random.default_rng((97, 1)))
    scenes["planogram"] = (img, actual["boxes"])

    for name, (img, gt_boxes) in scenes.items():
        det = gen.generate_proposals(img)
        rec, prec = greedy_recall(np.asarray(gt_boxes), np.asarray(det))
        out = f"{args.out}_{name}.png"
        save_boxes(img, det, out)
        report(scene=name, gt=int(len(gt_boxes)), detections=int(len(det)),
               recall=round(rec, 4), precision=round(prec, 4), png=out)
    report(name="DONE")


if __name__ == "__main__":
    main()
