"""Accuracy deltas for the structural serving Pareto (VERDICT r4 #4).

bench.py's CVPCE_BENCH_* knobs buy throughput by leaving the parity
workload (crop 256 MACVGG embed, 5120-candidate NMS). This script
measures what each option COSTS on the synthetic validation, so PERF.md
can publish img/s-vs-accuracy rows instead of a bare 10x conversation:

1. embed options — gt-crop classification top-1 (64 archetypes,
   in-domain AND shifted scenes, random-init encoders — the e2e
   headline's strongest arm) for MACVGG at crop 256/224/192 and
   MACResNet-1536 at 256.
2. NMS candidate budget — serving det recall/precision at the
   calibrated threshold for budgets 5120 (parity) and 1024, on mixed
   clean+shifted scenes with the trained detector.

Run (TPU): python scripts/pareto_study.py --gln artifacts/gln_r5
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def gt_crop_top1(enc, res, styles, scenes, shift, persp):
    """Random-encoder gallery classification of gt crops at `res`."""
    import jax.numpy as jnp

    from cvpce_tpu.data import transforms as T
    from cvpce_tpu.data.synthetic import (perspective_scene,
                                          planogram_scene,
                                          product_gallery_image)

    def prep(img):
        return T.scale_to_tanh(T.resize_for_classification(img, res))

    def embed(imgs):
        out = []
        b = 16
        for s in range(0, len(imgs), b):
            batch = np.stack(imgs[s:s + b])
            if len(batch) < b:
                batch = np.concatenate([batch, np.zeros(
                    (b - len(batch), *batch.shape[1:]), batch.dtype)])
            out.append(np.asarray(enc(jnp.asarray(batch))))
        e = np.concatenate(out)[:len(imgs)]
        return e / np.clip(np.linalg.norm(e, axis=1, keepdims=True),
                           1e-8, None)

    labels = [s["label"] for s in styles]
    gal = embed([prep(product_gallery_image(s)) for s in styles])
    hits, total = 0, 0
    for i in range(scenes):
        rng = np.random.default_rng((77, i))
        img, _, actual, _ = planogram_scene(832, 1344, styles, rng,
                                            domain_shift=shift)
        boxes = actual["boxes"]
        if persp > 0:
            img, boxes, _ = perspective_scene(img, boxes, rng, persp)
        crops = []
        keep = []
        for b_, lab in zip(boxes.astype(int), actual["labels"]):
            x1, y1, x2, y2 = b_
            c = img[max(0, y1):y2, max(0, x1):x2]
            if c.size == 0:
                continue
            crops.append(prep(c))
            keep.append(lab)
        q = embed(crops)
        pred = np.argmax(q @ gal.T, axis=1)
        hits += int(np.sum([labels[p] == l for p, l in zip(pred, keep)]))
        total += len(keep)
    return hits / max(1, total), total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gln", default="artifacts/gln_r5")
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--det-scenes", type=int, default=8)
    ap.add_argument("--products", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-det", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cvpce_tpu.data.synthetic import product_styles
    from cvpce_tpu.models.embedders import MACVGG, MACResNet

    styles = product_styles(args.products)

    variants = []
    for res in (256, 224, 192):
        model = MACVGG(batch_norm=False, train=False)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, res, res, 3)))
        variants.append((f"macvgg{res}", res,
                         jax.jit(lambda vv, x, m=model: m.apply(vv, x)), v))
    rmodel = MACResNet(train=False)
    rv = rmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    variants.append(("macresnet256", 256,
                     jax.jit(lambda vv, x, m=rmodel: m.apply(vv, x)), rv))

    for name, res, fn, v in variants:
        enc = lambda x: fn(v, x)  # noqa: E731
        for tag, shift, persp in (("indomain", 0.0, 0.0),
                                  ("shifted", 0.7, 0.5)):
            top1, n = gt_crop_top1(enc, res, styles, args.scenes,
                                   shift, persp)
            report(kind="embed", variant=name, task=tag, n=n,
                   top1=round(top1, 4))

    if args.skip_det:
        report(name="DONE")
        return

    # --- NMS candidate budget: serving recall/precision, trained GLN ---
    from cvpce_tpu.data.synthetic import perspective_scene, planogram_scene
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.pipeline.calibrate import (resolve_input_norm,
                                              resolve_threshold)
    from cvpce_tpu.pipeline.proposals import ProposalGenerator
    from cvpce_tpu.pipeline.serving import load_gln_variables

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_trained_pipeline import greedy_recall

    variables = load_gln_variables(args.gln)
    thr = resolve_threshold("auto", args.gln)
    norm = resolve_input_norm(args.gln, default="raw01")
    platform = jax.devices()[0].platform
    for budget in (5120, 1024):
        cfg = GLNConfig(canvas_h=832, canvas_w=1344,
                        max_nms_candidates=budget,
                        detections_per_img=1000,
                        use_pallas_nms=platform not in ("cpu",))
        gen = ProposalGenerator(variables, cfg, confidence_threshold=thr,
                                input_norm=norm)
        for tag, shift, persp in (("indomain", 0.0, 0.0),
                                  ("shifted", 0.7, 0.5)):
            recs, precs = [], []
            for i in range(args.det_scenes):
                rng = np.random.default_rng((78, i))
                img, _, actual, _ = planogram_scene(
                    832, 1344, styles, rng, domain_shift=shift)
                boxes = actual["boxes"]
                if persp > 0:
                    img, boxes, _ = perspective_scene(img, boxes, rng,
                                                      persp)
                det = gen.generate_proposals(img)
                r, p = greedy_recall(boxes, det)
                recs.append(r)
                precs.append(p)
            report(kind="nms_budget", budget=budget, task=tag,
                   scenes=args.det_scenes,
                   recall=round(float(np.mean(recs)), 4),
                   precision=round(float(np.mean(precs)), 4))
    report(name="DONE")


if __name__ == "__main__":
    main()
