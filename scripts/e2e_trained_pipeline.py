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


def _warm_and_fold(params, stats, warm_imgs):
    """Warm BN stats on `warm_imgs` (tanh-scale), fold BN, return a
    jitted EmbedFn (mirrors scripts/dihe_convergence.py eval-mode
    recipe)."""
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.models.embedders import MACVGG, EmbedFn, fold_bn_variables

    model_t = MACVGG(batch_norm=True, train=True)

    @jax.jit
    def warm(stats, batch):
        _, mut = model_t.apply({"params": params, "batch_stats": stats},
                               batch, mutable=["batch_stats"])
        return mut["batch_stats"]

    rng = np.random.default_rng(7)
    for _ in range(40):
        idx = rng.integers(0, len(warm_imgs), 8)
        batch = np.stack([warm_imgs[int(i)] for i in idx])
        stats = warm(stats, jnp.asarray(batch))

    variables = fold_bn_variables(
        {"params": params, "batch_stats": jax.device_get(stats)})
    model = MACVGG(batch_norm=False, train=False)
    fn = EmbedFn(model, variables)
    return fn, model.embedding_size


def build_arm_embedder(base: str, dihe_default: str, warm_clean,
                       warm_shifted):
    """Resolve an arm's encoder.

    base: 'random' (BN-free random-init MACVGG — the r2..r4 comparison
    arm), 'randombn' (random init, BN warmed + folded — the ablation
    scripts' baseline recipe), or 'dihe[:path]' (trained encoder,
    BN warmed + folded). warm_* are lists of tanh-scale 256x256 images;
    `warm_shifted` is used instead of `warm_clean` when the arm carries
    the '+bnshift' option (BN-statistics adaptation on deployment-domain
    crops — VERDICT r4 task-2 lever (c); the unlabeled shifted crops are
    the same data the reference's discriminator consumes,
    /root/reference/cvpce/classification_training.py:491-502)."""
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.models.embedders import MACVGG

    name, _, opts = base.partition("+")
    opts = set(opts.split("+")) if opts else set()
    warm_imgs = warm_shifted if "bnshift" in opts else warm_clean

    if name == "random" and "bnshift" not in opts:
        from cvpce_tpu.cli.common import load_embedder

        return load_embedder(None, batch_norm=False)
    if name in ("random", "randombn"):
        model = MACVGG(batch_norm=True, train=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 256, 3)))
        return _warm_and_fold(variables["params"],
                              variables["batch_stats"], warm_imgs)
    assert name.startswith("dihe"), f"unknown arm base {name!r}"
    from cvpce_tpu.pipeline.serving import load_dihe_encoder

    path = name[5:] if name.startswith("dihe:") else dihe_default
    params, stats = load_dihe_encoder(path)
    return _warm_and_fold(params, stats, warm_imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gln", default="/root/repo/checkpoints/gln_r3")
    ap.add_argument("--dihe", default="/root/repo/checkpoints/dihe_r3")
    ap.add_argument("--embedder", choices=["dihe", "random"],
                    default="dihe")
    ap.add_argument("--arms", default=None,
                    help="comma-separated embedder arms sharing ONE "
                         "detection pass per scene (the full matrix in "
                         "~1.3x the cost of a single row): each arm is "
                         "base[+opt...], base in {random, randombn, "
                         "dihe:<ckpt-dir>}, opts in {cc (scene-"
                         "statistics color correction of the classify "
                         "crops, pipeline/colorcorrect.py), bnshift "
                         "(BN stats adapted on shifted scene crops "
                         "instead of clean gallery renders), ccg "
                         "(self-calibrating white balance against the "
                         "catalog: classify raw crops, estimate the "
                         "cast from crop-to-matched-gallery color "
                         "ratios, re-classify corrected crops)}. "
                         "Overrides --embedder/--dihe.")
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--products", type=int, default=12)
    ap.add_argument("--texture", action="store_true",
                    help="texture-carried archetype identity "
                         "(product_styles(texture=True)) — the task "
                         "variant where identity survives photometric "
                         "shift")
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
    from cvpce_tpu.pipeline.evaluator import PlanogramComparator
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

    styles = product_styles(args.products, texture=args.texture)
    gallery = GallerySet(styles)

    # arm specs: one detection pass per scene, every arm classifies it
    if args.arms:
        arm_specs = [a.strip() for a in args.arms.split(",") if a.strip()]
    else:
        arm_specs = ["random" if args.embedder == "random"
                     else f"dihe:{args.dihe}"]

    warm_clean = [gallery[i][0] for i in range(len(gallery))]
    warm_shifted = None
    if any("bnshift" in a for a in arm_specs):
        from cvpce_tpu.data.synthetic import SceneCropSet

        crops_set = SceneCropSet(styles, n=128, canvas_h=h, canvas_w=w,
                                 domain_shift=args.domain_shift,
                                 perspective=args.perspective)
        # 50/50 clean gallery + deployment-domain crops: BN stats must
        # serve BOTH sides of the index/query pair (SceneCropSet items
        # are [0,1]; gallery items are already tanh-scale)
        warm_shifted = warm_clean + [
            T.scale_to_tanh(crops_set[i]) for i in range(len(crops_set))]

    comparator = PlanogramComparator()
    arms = []
    for spec in arm_specs:
        encoder_fn, emb_size = build_arm_embedder(
            spec, args.dihe, warm_clean, warm_shifted)
        classifier = Classifier(encoder_fn, emb_size, gallery,
                                batch_size=32)
        self_top1 = np.mean([
            classifier.classify(gallery[i][0][None])[0][0]
            == gallery[i][2] for i in range(len(gallery))])
        report(arm=spec, gallery_self_top1=round(float(self_top1), 4))
        opts = spec.split("+")[1:]
        arms.append({"spec": spec, "classifier": classifier,
                     "cc": "cc" in opts, "ccg": "ccg" in opts,
                     "rows": []})

    any_cc = any(a["cc"] for a in arms)
    any_ccg = any(a["ccg"] for a in arms)
    if any_cc:
        from cvpce_tpu.pipeline.colorcorrect import scene_color_correct
    if any_ccg:
        from cvpce_tpu.pipeline.colorcorrect import (center_mean_rgb,
                                                     gallery_feedback_gains)

        # catalog colors for the self-calibrating white balance (ccg):
        # gallery items are tanh-scale
        gal_mean = {gallery[i][2]:
                    center_mean_rgb((gallery[i][0] + 1.0) * 0.5)
                    for i in range(len(gallery))}

    recs, precs = [], []
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

        # ONE detection pass per scene, shared by every arm
        t0 = time.perf_counter()
        det, det_crops = generator.generate_proposals_and_images(img)
        det_wall = time.perf_counter() - t0
        rec, prec = greedy_recall(actual["boxes"], det)
        recs.append(rec)
        precs.append(prec)

        gt_crops = (generator._crop_boxes(img, actual["boxes"])
                    if len(actual["boxes"]) else None)
        if any_cc:
            img_cc = scene_color_correct(img)
            det_crops_cc = (generator._crop_boxes(img_cc, det)
                            if len(det) else det_crops)
            gt_crops_cc = (generator._crop_boxes(img_cc, actual["boxes"])
                           if len(actual["boxes"]) else None)

        for arm in arms:
            classifier = arm["classifier"]
            a_img = img_cc if arm["cc"] else img
            a_det_crops = det_crops_cc if arm["cc"] else det_crops
            a_gt_crops = gt_crops_cc if arm["cc"] else gt_crops
            if arm["ccg"] and len(det_crops):
                # self-calibrating white balance vs the catalog
                # (pipeline/colorcorrect.py:gallery_feedback_gains):
                # classify raw crops, estimate the scene cast from
                # crop<->matched-gallery color ratios, re-serve the
                # corrected crops/scene
                classes0 = [ann[0] for ann in
                            classifier.classify(det_crops)]
                crops01 = (det_crops + 1.0) * 0.5
                cm = np.stack([center_mean_rgb(c) for c in crops01])
                gm = np.stack([gal_mean[l] for l in classes0])
                gains = gallery_feedback_gains(cm, gm)
                a_img = np.clip(img * gains, 0.0, 1.0)
                a_det_crops = np.clip(crops01 * gains, 0, 1) * 2.0 - 1.0
                if gt_crops is not None:
                    a_gt_crops = np.clip(
                        (gt_crops + 1.0) * 0.5 * gains, 0, 1) * 2.0 - 1.0

            t0 = time.perf_counter()
            classes = ([ann[0] for ann in classifier.classify(a_det_crops)]
                       if len(a_det_crops) else [])
            compliance, _, _ = comparator.compare_detailed(
                plano, {"boxes": det, "labels": classes}, a_img,
                classifier)
            dt = det_wall + time.perf_counter() - t0

            if a_gt_crops is not None:
                pred = [ann[0] for ann in classifier.classify(a_gt_crops)]
                cls_acc = float(np.mean([p == l for p, l in
                                         zip(pred, actual["labels"])]))
                comp_cls = comparator.compare(
                    plano, {"boxes": actual["boxes"], "labels": pred},
                    a_img)
            else:
                cls_acc = comp_cls = float("nan")
            comp_oracle = comparator.compare(plano, actual, img)

            row = {"scene": i, "arm": arm["spec"], "violation_rate": vr,
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
                   "wall_s": round(dt, 3)}
            arm["rows"].append(row)
            report(**row)

    for arm in arms:
        rows = arm["rows"]
        comp_err = [abs(r["compliance"] - r["expected"]) for r in rows]
        n_int = max(1, sum(r["violation_rate"] == 0 for r in rows))
        # scene-level SE of the composed error (VERDICT r4 #5)
        se = float(np.std(comp_err, ddof=1) / np.sqrt(len(comp_err))) \
            if len(comp_err) > 1 else 0.0
        report(name="SUMMARY", arm=arm["spec"], scenes=len(rows),
               mean_oracle_compliance_err=round(float(np.mean(
                   [abs(r["compliance_oracle_gt"] - r["expected"])
                    for r in rows])), 4),
               mean_det_recall=round(float(np.mean(recs)), 4),
               mean_det_precision=round(float(np.mean(precs)), 4),
               mean_gt_crop_top1=round(float(np.nanmean(
                   [r["gt_crop_top1"] for r in rows])), 4),
               mean_abs_compliance_err=round(float(np.mean(comp_err)), 4),
               compliance_err_se=round(se, 4),
               intact_compliance=round(float(np.sum(
                   [r["compliance"] for r in rows
                    if r["violation_rate"] == 0]) / n_int), 4),
               violated_compliance=round(float(np.mean(
                   [r["compliance"] for r in rows
                    if r["violation_rate"] > 0] or [0.0])), 4),
               violated_expected=round(float(np.mean(
                   [r["expected"] for r in rows
                    if r["violation_rate"] > 0] or [0.0])), 4))


if __name__ == "__main__":
    main()
    report(name="DONE")
