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
@click.option("--gln-weights", required=True)
@click.option("--encoder-weights", default=None)
@click.option("--confidence", default=0.5, show_default=True)
def pipeline_demo(image, gallery, plano_path, gln_weights, encoder_weights,
                  confidence):
    """End-to-end demo on an arbitrary folder dataset + JSON planogram
    (cvpce/cli/misc.py:104-253)."""
    import numpy as np

    from ..data import transforms as T
    from ..data.grocery import SimpleFolderSet
    from ..pipeline.classifier import Classifier
    from ..pipeline.evaluator import PlanogramComparator, PlanogramEvaluator
    from ..pipeline.proposals import ProposalGenerator

    config = GLNConfig()
    variables = load_gln_variables(gln_weights, config)
    generator = ProposalGenerator(variables, config,
                                  confidence_threshold=confidence)
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
                                   PlanogramComparator())
    compliance = evaluator.evaluate(img, planogram)
    click.echo(json.dumps({"compliance": float(compliance)}))


@misc.command("retinanet-coco-test")
def retinanet_coco_test():
    """COCO sanity check of the base detector (cvpce/cli/misc.py:29-101).

    The reference validates torchvision's pretrained RetinaNet against
    pycocotools; our base-detector sanity check is the golden metric suite
    (tests/test_metrics_golden.py) plus `gln eval --coco`. pycocotools is
    not available in this environment."""
    raise click.UsageError(
        "pycocotools unavailable; run `pytest tests/test_metrics_golden.py` "
        "and `cvpce-tpu gln eval --coco` for the equivalent checks")
