"""Generate a golden fixture pinning eval/coco_protocol.py to REAL
pycocotools output.

VERDICT r3 missing #2: the repo re-implements the COCO protocol from
its definition (eval/coco_protocol.py) and validates it against
hand-computed cases — the referee grades its own exam. This script
closes the loop wherever real pycocotools exists (it does NOT ship in
this container — only typeshed stubs are present; verified 2026-08-20):

1. Deterministically generates a synthetic detection corpus (seeded
   numpy — same corpus everywhere, no image data needed).
2. Writes COCO-format gt/detection JSON next to the fixture, so the
   corpus is also consumable by any external COCOeval runner.
3. If `pycocotools` imports: runs COCOeval bbox end-to-end and stores
   its full `stats` vector (the 12 summarize() numbers) in
   tests/fixtures/pycoco_golden.json.
4. Always: runs our evaluate_coco_protocol on the identical corpus and
   stores its results, so the fixture records both sides.

tests/test_pycoco_fixture.py then pins our referee against the stored
pycocotools numbers (and re-checks our side stays bit-stable). Run this
script once on any machine with pycocotools installed and commit the
fixture:

    python scripts/make_pycoco_fixture.py
"""
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

FIXTURE = os.path.join(os.path.dirname(_HERE), "tests", "fixtures",
                       "pycoco_golden.json")
N_IMAGES = 12
N_CATS = 3
SEED = 20260820


def make_corpus(seed: int = SEED):
    """Deterministic per-image GT + noisy detections spanning the COCO
    area ranges, with misses, false positives and localization noise so
    every matching branch is exercised."""
    rng = np.random.default_rng(seed)
    images = []
    for img_id in range(N_IMAGES):
        w, h = 640, 480
        gts, dets = [], []
        n_gt = int(rng.integers(3, 9))
        for g in range(n_gt):
            cat = int(rng.integers(N_CATS))
            # areas across small/medium/large buckets
            side = float(rng.choice([16, 24, 48, 80, 120, 200]))
            ar = float(rng.uniform(0.6, 1.6))
            bw, bh = side * ar, side / ar
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            gts.append({"cat": cat, "box": [x, y, bw, bh]})
            # detection for most gts: jittered box, random score
            if rng.random() < 0.85:
                jx, jy = rng.normal(0, side * 0.06, 2)
                js = float(rng.uniform(0.85, 1.15))
                dets.append({
                    "cat": cat,
                    "box": [x + jx, y + jy, bw * js, bh * js],
                    "score": float(rng.uniform(0.3, 1.0)),
                })
            # occasional duplicate detection
            if rng.random() < 0.2:
                dets.append({
                    "cat": cat,
                    "box": [x + float(rng.normal(0, 4)), y, bw, bh],
                    "score": float(rng.uniform(0.1, 0.6)),
                })
        # false positives
        for _ in range(int(rng.integers(0, 4))):
            side = float(rng.choice([20, 60, 150]))
            dets.append({
                "cat": int(rng.integers(N_CATS)),
                "box": [float(rng.uniform(0, w - side)),
                        float(rng.uniform(0, h - side)), side, side],
                "score": float(rng.uniform(0.05, 0.9)),
            })
        images.append({"id": img_id, "w": w, "h": h,
                       "gts": gts, "dets": dets})
    return images


def to_coco_json(corpus):
    gt = {
        "info": {"description": "cvpce_tpu pycoco fixture corpus"},
        "licenses": [],
        "images": [{"id": im["id"], "width": im["w"], "height": im["h"],
                    "file_name": f"synthetic_{im['id']}.jpg"}
                   for im in corpus],
        "categories": [{"id": c + 1, "name": f"cat{c}"}
                       for c in range(N_CATS)],
        "annotations": [],
    }
    ann_id = 1
    for im in corpus:
        for g in im["gts"]:
            x, y, bw, bh = g["box"]
            gt["annotations"].append({
                "id": ann_id, "image_id": im["id"],
                "category_id": g["cat"] + 1,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    det = []
    for im in corpus:
        for d in im["dets"]:
            x, y, bw, bh = d["box"]
            det.append({"image_id": im["id"],
                        "category_id": d["cat"] + 1,
                        "bbox": [x, y, bw, bh], "score": d["score"]})
    return gt, det


def run_ours(corpus):
    from cvpce_tpu.eval.coco_protocol import (ImageDetections,
                                              evaluate_coco_protocol)

    images = {}
    for c in range(N_CATS):
        per_image = []
        for im in corpus:
            gt = np.asarray([g["box"] for g in im["gts"]
                             if g["cat"] == c], np.float64).reshape(-1, 4)
            dt = [d for d in im["dets"] if d["cat"] == c]
            db = np.asarray([d["box"] for d in dt],
                            np.float64).reshape(-1, 4)
            ds = np.asarray([d["score"] for d in dt], np.float64)
            # xywh -> xyxy
            if len(gt):
                gt = np.concatenate([gt[:, :2], gt[:, :2] + gt[:, 2:]], 1)
            if len(db):
                db = np.concatenate([db[:, :2], db[:, :2] + db[:, 2:]], 1)
            per_image.append(ImageDetections(db, ds, gt))
        images[f"cat{c}"] = per_image
    return evaluate_coco_protocol(images)


def run_pycocotools(gt_json, det_json):
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(gt_json, f)
        gt_path = f.name
    coco = COCO(gt_path)
    coco_dt = coco.loadRes(det_json)
    ev = COCOeval(coco, coco_dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    os.unlink(gt_path)
    return [float(s) for s in ev.stats]


def main():
    corpus = make_corpus()
    gt_json, det_json = to_coco_json(corpus)
    ours = run_ours(corpus)
    fixture = {
        "seed": SEED, "n_images": N_IMAGES, "n_cats": N_CATS,
        "ours": {"ap": ours["ap"], "ap50": ours["ap50"],
                 "ap75": ours["ap75"], "ar": ours["ar"],
                 "per_area": ours["per_area"]},
    }
    try:
        import pycocotools  # noqa: F401

        stats = run_pycocotools(gt_json, det_json)
        fixture["pycocotools_stats"] = stats
        print("pycocotools COCOeval stats:", stats)
    except ImportError:
        fixture["pycocotools_stats"] = None
        print("pycocotools NOT available here — fixture records only "
              "our referee's values. Re-run where pycocotools is "
              "installed to fill pycocotools_stats and commit.")
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(fixture, f, indent=1)
    with open(FIXTURE.replace("pycoco_golden.json",
                              "pycoco_corpus_gt.json"), "w") as f:
        json.dump(gt_json, f)
    with open(FIXTURE.replace("pycoco_golden.json",
                              "pycoco_corpus_det.json"), "w") as f:
        json.dump(det_json, f)
    print("our referee:", json.dumps(fixture["ours"], indent=1))
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main()
