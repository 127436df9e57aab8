"""End-to-end production validation with TRAINED weights.

Runs the full north-star path (SURVEY.md §3.3 / cvpce/production.py:
8-129) — GLN detect -> MXU crop -> DIHE-embedder classify ->
planogram graph match -> RANSAC -> compliance — on synthetic planogram
scenes with KNOWN expected compliance, using the checkpoints trained
this round on real TPU hardware:

- GLN: checkpoints/gln_r3 (full-canvas mixed shelf+planogram training,
  scripts/train_convergence.py --scene-mix mixed), served at the
  max-F1 calibrated threshold (--confidence auto reads
  serving_calibration.json; pipeline/calibrate.py).
- embedder: checkpoints/dihe_r3 (archetype-domain DIHE,
  scripts/dihe_archetypes.py) via --dihe; --embedder random serves a
  random-init MACVGG for comparison (the reference fine-tunes ImageNet
  weights instead, cvpce/cli/dihe.py:257-309).

Scenes place identity-carrying product archetypes
(data/synthetic.py:product_styles/planogram_scene) per a planogram;
violated scenes remove or swap a fraction of products, so the
evaluator's compliance should track (intact / planned).

Reports per scene: detection recall/precision vs rendered gt,
gt-crop classification top-1, pipeline compliance vs expected, and
end-to-end wall-clock. Prints JSON lines; run on the real v5e
(remote compile ~minutes). Usage:
  python scripts/e2e_trained_pipeline.py [--scenes 12] [--embedder dihe]
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


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def greedy_recall(gt: np.ndarray, det: np.ndarray, thr: float = 0.5):
    """(recall, precision) with one-to-one greedy matching at IoU thr."""
    m = iou_matrix(gt, det)
    used = np.zeros(len(det), bool)
    hit = 0
    for i in np.argsort(-m.max(axis=1) if len(det) else np.zeros(len(gt))):
        j_order = np.argsort(-m[i])
        for j in j_order:
            if m[i, j] < thr:
                break
            if not used[j]:
                used[j] = True
                hit += 1
                break
    rec = hit / max(1, len(gt))
    prec = hit / max(1, len(det))
    return rec, prec


class GallerySet:
    """Classifier sample_set: (tanh_img, tanh_img, label, label)."""

    def __init__(self, styles):
        from cvpce_tpu.data import transforms as T
        from cvpce_tpu.data.synthetic import product_gallery_image

        self.items = []
        for s in styles:
            img = product_gallery_image(s)
            img = T.scale_to_tanh(T.resize_for_classification(img))
            self.items.append((img, img, s["label"], s["label"]))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def load_dihe_embedder(dihe_dir: str, gallery):
    """Restore the DIHE run's encoder, warm BN stats on gallery renders,
    fold BN, return a jitted EmbedFn (mirrors scripts/dihe_convergence.py
    eval-mode recipe)."""
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.models.embedders import MACVGG, EmbedFn, fold_bn_variables
    from cvpce_tpu.pipeline.serving import load_dihe_encoder

    params, stats = load_dihe_encoder(dihe_dir)

    model_t = MACVGG(batch_norm=True, train=True)

    @jax.jit
    def warm(stats, batch):
        _, mut = model_t.apply({"params": params, "batch_stats": stats},
                               batch, mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.default_rng(7)
    for _ in range(40):
        idx = rng.integers(0, len(gallery), 8)
        batch = np.stack([gallery[int(i)][0] for i in idx])
        stats = warm(stats, jnp.asarray(batch))

    variables = fold_bn_variables(
        {"params": params, "batch_stats": jax.device_get(stats)})
    model = MACVGG(batch_norm=False, train=False)
    fn = EmbedFn(model, variables)
    return fn, model.embedding_size


def load_random_embedder():
    from cvpce_tpu.cli.common import load_embedder

    return load_embedder(None, batch_norm=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gln", default="/root/repo/checkpoints/gln_r3")
    ap.add_argument("--dihe", default="/root/repo/checkpoints/dihe_r3")
    ap.add_argument("--embedder", choices=["dihe", "random"],
                    default="dihe")
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--products", type=int, default=12)
    ap.add_argument("--violation-rate", type=float, default=0.3)
    ap.add_argument("--domain-shift", type=float, default=0.0,
                    help="photometric deployment-domain shift on the "
                         "scenes (gallery stays clean) — r4 hardened "
                         "ablation; affects detection AND "
                         "classification, identically across embedder "
                         "choices")
    ap.add_argument("--perspective", type=float, default=0.0,
                    help="camera-tilt perspective warp on scenes; the "
                         "expected planogram stays unwarped, so the "
                         "RANSAC homography stage must recover the "
                         "warp (cv2.findHomography's whole purpose in "
                         "the reference, cvpce/planograms.py:199)")
    ap.add_argument("--confidence", default="auto",
                    help="detection serving threshold; 'auto' reads "
                         "serving_calibration.json from --gln "
                         "(pipeline/calibrate.py), a number pins it "
                         "(the reference's fixed 0.5, production.py:14)")
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344),
                    help="detector canvas — must match the checkpoint's "
                         "training canvas")
    ap.add_argument("--det-per-img", type=int, default=1000)
    ap.add_argument("--nms-candidates", type=int, default=5120)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU platform (fast smoke of the "
                         "script logic; the axon plugin otherwise "
                         "forces the tunneled TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cvpce_tpu.data import transforms as T
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
    confidence = resolve_threshold(args.confidence, args.gln)
    input_norm = resolve_input_norm(args.gln, default="raw01")
    report(platform=platform, embedder=args.embedder,
           confidence=round(confidence, 4),
           calibrated=args.confidence == "auto", input_norm=input_norm)

    # trained GLN at its training canvas (template-free restore: works
    # off a full training run dir OR a params-only serving export)
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
        encoder_fn, emb_size = load_random_embedder()
    classifier = Classifier(encoder_fn, emb_size, gallery, batch_size=32)
    evaluator = PlanogramEvaluator(generator, classifier,
                                   PlanogramComparator())

    # gallery self-retrieval sanity
    self_top1 = np.mean([
        classifier.classify(gallery[i][0][None])[0][0] == gallery[i][2]
        for i in range(len(gallery))])
    report(gallery_self_top1=round(float(self_top1), 4))

    recs, precs, cls_accs, comp_err = [], [], [], []
    rows = []
    for i in range(args.scenes):
        rng = np.random.default_rng((41, i))
        vr = 0.0 if i % 2 == 0 else args.violation_rate
        img, plano, actual, expected = planogram_scene(
            h, w, styles, rng, violation_rate=vr,
            domain_shift=args.domain_shift)
        if args.perspective > 0:
            from cvpce_tpu.data.synthetic import perspective_scene

            img, actual["boxes"], _ = perspective_scene(
                img, actual["boxes"], rng, args.perspective)

        # detection quality vs rendered gt
        det = generator.generate_proposals(img)
        rec, prec = greedy_recall(actual["boxes"], det)

        # classification on gt crops (isolates the classify stage)
        if len(actual["boxes"]):
            crops = generator._crop_boxes(img, actual["boxes"])
            pred = [ann[0] for ann in classifier.classify(crops)]
            cls_acc = float(np.mean([p == l for p, l in
                                     zip(pred, actual["labels"])]))
        else:
            cls_acc = float("nan")

        t0 = time.perf_counter()
        compliance = evaluator.evaluate(img, plano)
        dt = time.perf_counter() - t0

        # stage-isolation oracles: comparator on clean gt inputs
        # (pipeline-machinery check; == expected when exact) and on
        # gt boxes with PREDICTED labels (isolates classification).
        comp_oracle = evaluator.comparator.compare(plano, actual, img)
        if len(actual["boxes"]):
            comp_cls = evaluator.comparator.compare(
                plano, {"boxes": actual["boxes"], "labels": pred}, img)
        else:
            comp_cls = float("nan")

        recs.append(rec)
        precs.append(prec)
        cls_accs.append(cls_acc)
        comp_err.append(abs(compliance - expected))
        rows.append({"scene": i, "violation_rate": vr,
                     "planned": len(plano["labels"]),
                     "rendered": len(actual["labels"]),
                     "detections": int(len(det)),
                     "det_recall": round(rec, 4),
                     "det_precision": round(prec, 4),
                     "gt_crop_top1": round(cls_acc, 4),
                     "compliance": round(float(compliance), 4),
                     "compliance_oracle_gt": round(float(comp_oracle), 4),
                     "compliance_gtboxes_predlabels":
                         round(float(comp_cls), 4),
                     "expected": round(float(expected), 4),
                     "wall_s": round(dt, 3)})
        report(**rows[-1])

    report(name="SUMMARY",
           mean_oracle_compliance_err=round(float(np.mean(
               [abs(r["compliance_oracle_gt"] - r["expected"])
                for r in rows])), 4),
           mean_det_recall=round(float(np.mean(recs)), 4),
           mean_det_precision=round(float(np.mean(precs)), 4),
           mean_gt_crop_top1=round(float(np.nanmean(cls_accs)), 4),
           mean_abs_compliance_err=round(float(np.mean(comp_err)), 4),
           intact_compliance=round(float(np.mean(
               [r["compliance"] for r in rows
                if r["violation_rate"] == 0])), 4),
           violated_compliance=round(float(np.mean(
               [r["compliance"] for r in rows
                if r["violation_rate"] > 0])), 4),
           violated_expected=round(float(np.mean(
               [r["expected"] for r in rows
                if r["violation_rate"] > 0])), 4))


if __name__ == "__main__":
    main()
    report(name="DONE")
