"""Top-level evaluation commands (reference: cvpce/cli/eval.py)."""
from __future__ import annotations

import json

import click
import numpy as np

from ..data import defaults
from .common import (default_gln_config, load_embedder,
                     load_gln_variables)


def _pipeline_options(f):
    f = click.option("--gln-weights", required=True)(f)
    f = click.option("--encoder-weights", default=None)(f)
    f = click.option("--source", multiple=True,
                     default=defaults.GP_TRAIN_FOLDERS, show_default=True)(f)
    f = click.option("--test-imgs", default=defaults.GP_TEST_DIR,
                     show_default=True)(f)
    f = click.option("--test-annotations", default=defaults.GP_ANN_DIR,
                     show_default=True)(f)
    f = click.option("--index", default=None,
                     help="prebuilt classifier index")(f)
    f = click.option("--confidence", default="auto", show_default=True,
                     help="detection serving threshold; 'auto' reads the "
                          "max-F1 calibration persisted next to the GLN "
                          "checkpoint (pipeline/calibrate.py) and falls "
                          "back to the reference's fixed 0.5 "
                          "(cvpce/production.py:14) when absent")(f)
    f = click.option("--fast", is_flag=True,
                     help="bf16 + approx top-k TPU speed path")(f)
    f = click.option("--canvas", nargs=2, type=int, default=(832, 1344),
                     show_default=True, help="detector canvas (h w)")(f)
    f = click.option("--max-detections", default=1000, show_default=True,
                     help="detections_per_img cap")(f)
    f = click.option("--nms-candidates", default=5120, show_default=True,
                     help="per-level NMS candidate cap")(f)
    f = click.option("--sharded-gallery", is_flag=True,
                     help="shard the gallery index across all devices "
                          "(ops/knn_sharded.py pod-scale search)")(f)
    return f


def _build_pipeline(gln_weights, encoder_weights, source, index,
                    confidence, k=1, fast=False, sharded_gallery=False,
                    canvas=(832, 1344), max_detections=1000,
                    nms_candidates=5120):
    import dataclasses

    from ..data.grocery import GroceryProductsDataset
    from ..pipeline.calibrate import (calibration_dir_for_weights,
                                      load_calibration, resolve_input_norm,
                                      resolve_threshold)
    from ..pipeline.classifier import Classifier
    from ..pipeline.proposals import ProposalGenerator

    config = dataclasses.replace(
        default_gln_config(fast), canvas_h=canvas[0], canvas_w=canvas[1],
        detections_per_img=max_detections,
        max_nms_candidates=nms_candidates)
    variables = load_gln_variables(gln_weights, config)
    ckpt_dir = calibration_dir_for_weights(gln_weights)
    threshold = resolve_threshold(confidence, ckpt_dir)
    provenance = ("pinned" if confidence not in (None, "auto")
                  else "calibrated" if load_calibration(ckpt_dir)
                  else "reference default")
    click.echo(f"serving confidence threshold: {threshold:.4f} "
               f"({provenance})", err=True)
    generator = ProposalGenerator(
        variables, config, confidence_threshold=threshold,
        input_norm=resolve_input_norm(ckpt_dir))
    # --fast extends to the embed stage: int8 MXU convs (vgg16 path)
    encoder_fn, emb_size = load_embedder(encoder_weights, int8=fast)
    mesh = None
    if sharded_gallery:
        from ..parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()
    if index:
        classifier = Classifier(encoder_fn, emb_size, load=index, k=k,
                                mesh=mesh)
    else:
        sampleset = GroceryProductsDataset(list(source), random_crop=False,
                                           include_annotations=True)
        classifier = Classifier(encoder_fn, emb_size, sampleset, k=k,
                                mesh=mesh)
    return generator, classifier


@click.command("eval-product-detection")
@_pipeline_options
@click.option("--iou-threshold", "-t", "iou_thresholds", type=float,
              multiple=True, default=(0.5,), show_default=True,
              help="IoU thresholds (cvpce/cli/eval.py:32)")
@click.option("--coco", is_flag=True,
              help="IoU sweep 0.5:0.95 instead of --iou-threshold")
@click.option("--out", default=None)
def eval_product_detection(gln_weights, encoder_weights, source, test_imgs,
                           test_annotations, index, confidence, fast,
                           canvas, max_detections, nms_candidates,
                           sharded_gallery, iou_thresholds, coco, out):
    """GLN+DIHE product detection mAP/mAR300 on GP-180
    (cvpce/cli/eval.py:12-71)."""
    from ..data.grocery import GroceryProductsTestSet
    from ..eval.detection import evaluate_detections, mean_average_metrics

    generator, classifier = _build_pipeline(
        gln_weights, encoder_weights, source, index, confidence, fast=fast,
        sharded_gallery=sharded_gallery, canvas=canvas,
        max_detections=max_detections, nms_candidates=nms_candidates)
    testset = GroceryProductsTestSet(test_imgs, test_annotations)
    thresholds = tuple(np.arange(0.5, 1.0, 0.05).round(2)) if coco \
        else tuple(iou_thresholds)
    per_class, overall = evaluate_detections(generator, classifier, testset,
                                             thresholds=thresholds)
    mam = mean_average_metrics(per_class, thresholds)
    result = {
        "overall": {str(t): {k: float(v) for k, v in d.items()}
                    for t, d in overall.items()},
        "mean": {str(t): d for t, d in mam.items()},
    }
    click.echo(json.dumps(result, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump(result, f)


@click.command("eval-planograms")
@_pipeline_options
@click.option("--planograms", "plano_dir", default=defaults.GP_PLANO_DIR,
              show_default=True)
@click.option("--internal", default=None,
              help="internal planoset dir instead of GP-180")
@click.option("--verbose", is_flag=True,
              help="include per-image results (cvpce/cli/eval.py:189)")
@click.option("--color-correct", is_flag=True,
              help="remove the scene-level white-balance cast from the "
                   "classify crops (pipeline/colorcorrect.py); "
                   "detection input stays raw")
@click.option("--out", default=None)
def eval_planograms(gln_weights, encoder_weights, source, test_imgs,
                    test_annotations, index, confidence, fast,
                    canvas, max_detections, nms_candidates,
                    sharded_gallery, plano_dir, internal, verbose,
                    color_correct, out):
    """End-to-end compliance eval: mean accuracy + MSE vs ground truth
    (cvpce/cli/eval.py:160-240)."""
    from ..data.planograms import InternalPlanoSet, PlanogramTestSet
    from ..eval.compliance import evaluate_planograms
    from ..pipeline.evaluator import PlanogramComparator, PlanogramEvaluator

    generator, classifier = _build_pipeline(
        gln_weights, encoder_weights, source, index, confidence, fast=fast,
        sharded_gallery=sharded_gallery, canvas=canvas,
        max_detections=max_detections, nms_candidates=nms_candidates)
    if internal:
        planoset = InternalPlanoSet(internal)
    else:
        planoset = PlanogramTestSet(test_imgs, test_annotations, plano_dir)
    evaluator = PlanogramEvaluator(generator, classifier,
                                   PlanogramComparator(),
                                   color_correct=color_correct)
    result = evaluate_planograms(evaluator, planoset)
    click.echo(json.dumps({k: v for k, v in result.items()
                           if verbose or k != "per_image"}, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump(result, f)


@click.command("rebuild-scene")
@_pipeline_options
@click.argument("image", type=click.Path(exists=True))
@click.option("--out", required=True)
def rebuild_scene(gln_weights, encoder_weights, source, test_imgs,
                  test_annotations, index, confidence, fast,
                  canvas, max_detections, nms_candidates,
                  sharded_gallery, image, out):
    """Paste gallery images at detection positions
    (cvpce/cli/eval.py:73-158)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from ..data import transforms as T
    from ..data.grocery import GroceryProductsDataset

    generator, classifier = _build_pipeline(
        gln_weights, encoder_weights, source, index, confidence, fast=fast,
        sharded_gallery=sharded_gallery, canvas=canvas,
        max_detections=max_detections, nms_candidates=nms_candidates)
    gallery = GroceryProductsDataset(list(source), random_crop=False,
                                     include_annotations=True)
    img = T.load_image(image)
    res = generator.detect_with_crops(img)
    labels = [ann[0] for ann in classifier.classify(res["crops"])] \
        if len(res["crops"]) else []

    canvas = np.ones_like(img)
    for box, label in zip(res["boxes"].astype(int), labels):
        idx = gallery.index_for_ann(label)
        if idx is None:
            continue
        x1, y1, x2, y2 = np.clip(box, 0, None)
        x2 = min(x2, img.shape[1])
        y2 = min(y2, img.shape[0])
        if x2 - x1 < 2 or y2 - y1 < 2:
            continue
        product = T.load_image(gallery.paths[idx])
        canvas[y1:y2, x1:x2] = T.resize_bilinear_np(
            product, y2 - y1, x2 - x1)
    fig, axes = plt.subplots(1, 2, figsize=(16, 9))
    axes[0].imshow(img)
    axes[1].imshow(canvas)
    for ax in axes:
        ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    click.echo(f"saved {out} ({len(labels)} products)")


@click.command("plot-planogram-eval")
@_pipeline_options
@click.option("--planograms", "plano_dir", default=defaults.GP_PLANO_DIR,
              show_default=True)
@click.option("--internal", default=None,
              help="internal planoset dir instead of GP-180 "
                   "(cvpce/cli/eval.py:268)")
@click.option("--plano-idx", type=int, default=0, show_default=True,
              help="index into the internal planoset "
                   "(cvpce/cli/eval.py:271)")
@click.option("--store", default=None, help="GP-180 store id")
@click.option("--image", "image_id", default=None, help="GP-180 image id")
@click.option("--out", required=True)
def plot_planogram_eval(gln_weights, encoder_weights, source, test_imgs,
                        test_annotations, index, confidence, fast,
                        canvas, max_detections, nms_candidates,
                        sharded_gallery, plano_dir, internal, plano_idx,
                        store, image_id, out):
    """Step-by-step compliance visualization (cvpce/cli/eval.py:242-371):
    detections, planogram layout, matched/missing products."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import patches, pyplot as plt

    from ..data.planograms import InternalPlanoSet, PlanogramTestSet
    from ..pipeline import planograms as pg

    generator, classifier = _build_pipeline(
        gln_weights, encoder_weights, source, index, confidence, fast=fast,
        sharded_gallery=sharded_gallery, canvas=canvas,
        max_detections=max_detections, nms_candidates=nms_candidates)
    if internal:
        planoset = InternalPlanoSet(internal)
        img, iplano = planoset[plano_idx]
        plano = {"boxes": np.asarray(iplano["boxes"], np.float32),
                 "labels": list(iplano["labels"]),
                 "graph": pg.build_graph(
                     np.asarray(iplano["boxes"], np.float32),
                     list(iplano["labels"]))}
    else:
        if store is None or image_id is None:
            raise click.UsageError(
                "--store/--image are required without --internal")
        planoset = PlanogramTestSet(test_imgs, test_annotations, plano_dir)
        idx = planoset.get_index_for(store, image_id)
        if idx is None:
            raise click.UsageError(f"no test image s{store}_{image_id}")
        img, _, _, plano = planoset[idx]

    res = generator.detect_with_crops(img)
    labels = [a[0] for a in classifier.classify(res["crops"])] \
        if len(res["crops"]) else []
    ge = plano["graph"]
    ga = pg.build_graph(res["boxes"], labels) if len(labels) else None
    matching = pg.large_common_subgraph(ge, ga) if ga is not None else set()

    fig, axes = plt.subplots(1, 3, figsize=(22, 8))
    axes[0].imshow(img)
    for (x1, y1, x2, y2), lbl in zip(res["boxes"], labels):
        axes[0].add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                            fill=False, edgecolor="lime"))
    axes[0].set_title(f"detections ({len(labels)})")

    pb = plano["boxes"]
    axes[1].set_xlim(pb[:, 0].min() - 1, pb[:, 2].max() + 1)
    axes[1].set_ylim(pb[:, 1].min() - 1, pb[:, 3].max() + 1)
    matched1 = {n1 for n1, _ in matching}
    for i, (x1, y1, x2, y2) in enumerate(pb):
        color = "green" if i in matched1 else "red"
        axes[1].add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                            fill=False, edgecolor=color))
    axes[1].set_title(f"planogram (matched {len(matching)}/{len(pb)})")

    score = None
    if matching:
        found, _, missing_pos, _ = pg.finalize_via_ransac(
            matching, pb, res["boxes"], plano["labels"], labels,
            reproj_threshold=min(img.shape[:2]) * 0.01)
        if found is not None:
            score = float(found.sum() / len(found))
            axes[2].imshow(img)
            for x1, y1, x2, y2 in missing_pos:
                axes[2].add_patch(patches.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False,
                    edgecolor="red", linewidth=2))
    axes[2].set_title(f"missing products (compliance {score})")
    for ax in axes:
        ax.axis("off") if ax is not axes[1] else None
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    click.echo(f"saved {out}; compliance={score}")
