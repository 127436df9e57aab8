"""`misc` command group (reference: cvpce/cli/misc.py)."""
from __future__ import annotations

import json

import click

from ..models.gln import GLNConfig
from .common import load_embedder, load_gln_variables


@click.group()
def misc():
    """Miscellaneous utilities."""


@misc.command("pipeline-demo")
@click.argument("image", type=click.Path(exists=True))
@click.option("--gallery", required=True, type=click.Path(exists=True),
              help="folder with one image per product, filename = label")
@click.option("--planogram", "plano_path", required=True,
              type=click.Path(exists=True),
              help="JSON planogram: [{label, box: [x1,y1,x2,y2]}, ...]")
@click.option("--gln-weights", default=None,
              help="GLN checkpoint; random init if omitted (demo mode)")
@click.option("--encoder-weights", default=None)
@click.option("--confidence", default="auto", show_default=True,
              help="'auto' reads the max-F1 calibration persisted next "
                   "to --gln-weights, else the reference's fixed 0.5")
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True, help="detector canvas (h w)")
@click.option("--color-correct", is_flag=True,
              help="remove the scene-level white-balance cast from the "
                   "classify crops (pipeline/colorcorrect.py)")
def pipeline_demo(image, gallery, plano_path, gln_weights, encoder_weights,
                  confidence, canvas, color_correct):
    """End-to-end demo on an arbitrary folder dataset + JSON planogram
    (cvpce/cli/misc.py:104-253)."""
    import numpy as np

    from ..data import transforms as T
    from ..data.grocery import SimpleFolderSet
    from ..pipeline.classifier import Classifier
    from ..pipeline.evaluator import PlanogramComparator, PlanogramEvaluator
    from ..pipeline.proposals import ProposalGenerator

    h, w = canvas
    config = GLNConfig(canvas_h=h, canvas_w=w,
                       max_nms_candidates=min(5120, (h // 8) * (w // 8)),
                       detections_per_img=min(1000, (h // 8) * (w // 8)))
    variables = load_gln_variables(gln_weights, config)
    from ..pipeline.calibrate import (calibration_dir_for_weights,
                                      resolve_input_norm, resolve_threshold)

    ckpt_dir = calibration_dir_for_weights(gln_weights)
    threshold = resolve_threshold(confidence, ckpt_dir)
    generator = ProposalGenerator(variables, config,
                                  confidence_threshold=threshold,
                                  input_norm=resolve_input_norm(ckpt_dir))
    encoder_fn, emb_size = load_embedder(encoder_weights)

    folder = SimpleFolderSet(gallery)
    # SimpleFolderSet items are [0,1] 256 crops; classifier wants tanh scale
    class _TanhSet:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, i):
            img, gen, c1, c2 = self.base[i]
            return T.scale_to_tanh(img), T.scale_to_tanh(gen), c1, c2

    classifier = Classifier(encoder_fn, emb_size, _TanhSet(folder))

    with open(plano_path) as f:
        plano_json = json.load(f)
    planogram = {
        "boxes": np.asarray([e["box"] for e in plano_json], np.float32),
        "labels": [e["label"] for e in plano_json],
    }
    img = T.load_image(image)
    evaluator = PlanogramEvaluator(generator, classifier,
                                   PlanogramComparator(),
                                   color_correct=color_correct)
    compliance = evaluator.evaluate(img, planogram)
    click.echo(json.dumps({"compliance": float(compliance)}))


@misc.command("retinanet-coco-test")
@click.option("--imgs", required=True)
@click.option("--annotations", required=True,
              help="COCO instances_*.json")
@click.option("--weights", default=None,
              help="GLN checkpoint; random init if omitted (smoke mode)")
@click.option("--limit", default=100, show_default=True)
@click.option("--coco-thresholds", "coco_sweep", is_flag=True)
@click.option("--canvas", nargs=2, type=int, default=(832, 1344),
              show_default=True, help="detector canvas (h w)")
def retinanet_coco_test(imgs, annotations, weights, limit, coco_sweep,
                        canvas):
    """Base-detector sanity check on COCO (cvpce/cli/misc.py:29-101).

    The reference runs torchvision's pretrained RetinaNet through
    pycocotools COCOeval (cvpce/cli/misc.py:54-101) — an INDEPENDENT
    referee. Both graders run here: the in-house reference metric suite
    (ops/metrics.py, 11-pt VOC AP pinned by golden tests) and the
    pycocotools-equivalent COCO protocol (eval/coco_protocol.py: 101-pt
    AP, area ranges, maxDets), cross-checking each other on the same
    detections."""
    import numpy as np

    from ..data.coco import CocoDetectionDataset
    from ..eval.coco_protocol import (ImageDetections,
                                      evaluate_coco_protocol)
    from ..eval.proposals import DetectionEvalAdapter, evaluate_gln

    h, w = canvas
    config = GLNConfig(canvas_h=h, canvas_w=w,
                       max_nms_candidates=min(5120, (h // 8) * (w // 8)),
                       detections_per_img=min(1000, (h // 8) * (w // 8)))
    # index the dataset before the (slow) model init so bad paths fail fast
    base = CocoDetectionDataset(imgs, annotations)
    variables = load_gln_variables(weights, config)
    if limit:
        base.index = base.index[:limit]
    adapter = DetectionEvalAdapter(
        base, lambda it: (it[0], it[1]["boxes"]),
        config.canvas_h, config.canvas_w)
    thresholds = (tuple(np.arange(0.5, 1.0, 0.05).round(2))
                  if coco_sweep else (0.5,))
    res, (tgts, preds, confs) = evaluate_gln(
        variables, adapter, config, thresholds=thresholds,
        return_detections=True)
    referee = evaluate_coco_protocol({None: [
        ImageDetections(p, c, t) for t, p, c in zip(tgts, preds, confs)]})
    summary = {
        "reference_protocol": {
            str(t): {k: float(v) for k, v in d.items() if k != "raw"}
            for t, d in res.items()},
        "coco_protocol": {k: v for k, v in referee.items()
                          if k != "per_threshold"},
    }

    def _sanitize(obj):  # NaN (empty area bucket) -> null for strict JSON
        if isinstance(obj, dict):
            return {k: _sanitize(v) for k, v in obj.items()}
        if isinstance(obj, float) and obj != obj:
            return None
        return obj

    click.echo(json.dumps(_sanitize(summary), indent=2))
