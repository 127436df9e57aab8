"""CPU probe: does scene-statistics color correction recover identity?

Renders hardened-task planogram scenes (64 archetypes, photometric
shift + perspective), then measures gt-crop classification top-1 for
{raw, corrected} query crops against the clean gallery:

- mean-RGB nearest-neighbor (pure photometric identity — isolates what
  the correction recovers in pixel space, no encoder confound)
- optional --vgg: random-init MACVGG embeddings (the serving metric;
  slow on the 1-core host, keep --crops small)

Also reports per-scene MAE to the clean render of the SAME layout
(planogram_scene draws layout before the shift, so equal seeds give
pixel-aligned pairs).

Usage: python scripts/probe_colorcorrect.py [--scenes 6] [--vgg]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(**kw):
    print(json.dumps(kw), flush=True)


def crop(img, box):
    x1, y1, x2, y2 = [int(v) for v in box]
    return img[max(0, y1):y2, max(0, x1):x2]


def center_mean_rgb(img):
    h, w = img.shape[:2]
    return img[h // 4: 3 * h // 4, w // 4: 3 * w // 4].reshape(-1, 3).mean(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--products", type=int, default=64)
    ap.add_argument("--domain-shift", type=float, default=0.7)
    ap.add_argument("--perspective", type=float, default=0.5)
    ap.add_argument("--texture", action="store_true")
    ap.add_argument("--crops", type=int, default=64,
                    help="max gt crops for the --vgg eval")
    ap.add_argument("--vgg", action="store_true")
    ap.add_argument("--canvas", nargs=2, type=int, default=(832, 1344))
    args = ap.parse_args()

    from cvpce_tpu.data.synthetic import (perspective_scene, planogram_scene,
                                          product_gallery_image,
                                          product_styles)
    from cvpce_tpu.pipeline.colorcorrect import scene_color_correct

    h, w = args.canvas
    styles = product_styles(args.products, texture=args.texture)
    gal_means = np.stack([center_mean_rgb(product_gallery_image(s))
                          for s in styles])
    labels = [s["label"] for s in styles]

    raw_hits, cc_hits, total = 0, 0, 0
    maes_raw, maes_cc = [], []
    all_crops = []  # (raw_crop, cc_crop, label) for --vgg
    for i in range(args.scenes):
        rng = np.random.default_rng((91, i))
        img, plano, actual, _ = planogram_scene(
            h, w, styles, rng, violation_rate=0.0,
            domain_shift=args.domain_shift)
        rng_clean = np.random.default_rng((91, i))
        clean, _, _, _ = planogram_scene(h, w, styles, rng_clean,
                                         violation_rate=0.0,
                                         domain_shift=0.0)
        boxes = actual["boxes"]
        if args.perspective > 0:
            img, boxes, H = perspective_scene(img, boxes, rng,
                                              args.perspective)
        cc = scene_color_correct(img)
        if args.perspective <= 0:
            maes_raw.append(float(np.abs(img - clean).mean()))
            maes_cc.append(float(np.abs(cc - clean).mean()))
        for box, label in zip(boxes, actual["labels"]):
            cr, cx = crop(img, box), crop(cc, box)
            if cr.size == 0:
                continue
            raw_hits += labels[int(np.argmin(
                ((gal_means - center_mean_rgb(cr)) ** 2).sum(1)))] == label
            cc_hits += labels[int(np.argmin(
                ((gal_means - center_mean_rgb(cx)) ** 2).sum(1)))] == label
            total += 1
            if len(all_crops) < args.crops:
                all_crops.append((cr, cx, label))

    report(mode="mean_rgb_nn", products=args.products,
           texture=args.texture, shift=args.domain_shift,
           perspective=args.perspective, n=total,
           raw_top1=round(raw_hits / max(1, total), 4),
           cc_top1=round(cc_hits / max(1, total), 4),
           mae_raw=round(float(np.mean(maes_raw)), 4) if maes_raw else None,
           mae_cc=round(float(np.mean(maes_cc)), 4) if maes_cc else None)

    if args.vgg:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from cvpce_tpu.cli.common import load_embedder
        from cvpce_tpu.data import transforms as T

        enc_fn, _ = load_embedder(None, batch_norm=False)

        def embed(imgs):
            out = []
            for start in range(0, len(imgs), 8):
                batch = np.stack([
                    T.scale_to_tanh(T.resize_for_classification(im))
                    for im in imgs[start:start + 8]])
                if len(batch) < 8:
                    batch = np.concatenate([batch, np.zeros(
                        (8 - len(batch), *batch.shape[1:]), batch.dtype)])
                e = np.asarray(enc_fn(batch))
                out.append(e)
            e = np.concatenate(out)[:len(imgs)]
            return e / np.linalg.norm(e, axis=1, keepdims=True)

        gal = embed([product_gallery_image(s) for s in styles])
        for name, idx in (("raw", 0), ("cc", 1)):
            q = embed([c[idx] for c in all_crops])
            pred = np.argmax(q @ gal.T, axis=1)
            top1 = float(np.mean([labels[p] == c[2]
                                  for p, c in zip(pred, all_crops)]))
            report(mode="vgg_random", variant=name, n=len(all_crops),
                   top1=round(top1, 4))


if __name__ == "__main__":
    main()
    report(name="DONE")
