"""GLN proposal evaluation: AP/AR over a detection dataset.

Re-design of cvpce/proposals_eval.py. The reference splits sync/async
variants because its Python metric loop is slow (metrics.py:140-175,
multiprocessing fan-out that deadlocks under DDP —
proposals_training.py:117); our matcher is a vectorized device op, so a
single streaming path suffices and is faster than both.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import transforms as T
from ..models.gln import GLN, GLNConfig, postprocess_detections
from ..ops import metrics as M

Array = jnp.ndarray


def make_inference_fn(variables: Dict, config: GLNConfig) -> Callable:
    anchors, counts = config.anchors()
    model = GLN(config=config, train=False)
    anchors_j = jnp.asarray(anchors)

    @jax.jit
    def infer(images: Array, image_sizes: Array) -> Dict[str, Array]:
        outputs = model.apply(variables, images)
        return postprocess_detections(outputs, anchors_j, counts,
                                      image_sizes, config)

    return infer


def make_variables_inference_fn(config: GLNConfig, mesh=None) -> Callable:
    """Like make_inference_fn but with `variables` as a traced argument:
    (variables, images, image_sizes) -> detections. One compilation serves
    every checkpoint of a training run (the closure version retraces per
    weight snapshot — expensive where remote compile is slow).

    `mesh`: a jax.sharding.Mesh for data-parallel batch inference —
    variables replicate, the image batch shards on the mesh's first axis,
    and each chip postprocesses its shard (NMS is per-image, so sharding
    is exact). The reference's eval is strictly single-GPU
    (cvpce/proposals_eval.py); this is the pod-scale path.
    """
    anchors, counts = config.anchors()
    model = GLN(config=config, train=False)
    anchors_j = jnp.asarray(anchors)

    def infer(variables: Dict, images: Array,
              image_sizes: Array) -> Dict[str, Array]:
        outputs = model.apply(variables, images)
        return postprocess_detections(outputs, anchors_j, counts,
                                      image_sizes, config)

    if mesh is None:
        return jax.jit(infer)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(infer, in_shardings=(repl, data, data))


class DetectionEvalAdapter:
    """Wrap any (image, boxes) dataset into canvas-transformed eval items
    so evaluate_gln can consume GP-180 / GP-baseline sets too
    (cvpce/cli/gln.py:230-280 evaluates gp/gpbaseline besides sku110k)."""

    def __init__(self, base, extract, canvas_h: int, canvas_w: int):
        """extract: item -> (image HWC [0,1], boxes (T, 4))."""
        self.base = base
        self.extract = extract
        self.canvas_h = canvas_h
        self.canvas_w = canvas_w

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int) -> Dict:
        img, boxes = self.extract(self.base[i])
        canvas, sboxes, (ch, cw), scale = T.detection_canvas(
            img, boxes, self.canvas_h, self.canvas_w)
        return {
            "image": canvas,
            "boxes": sboxes,
            "image_size": np.array([ch, cw], np.int32),
            "scale": np.float32(scale),
            "orig_boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        }


def evaluate_gln(variables: Dict, dataset, config: GLNConfig,
                 thresholds: Sequence[float] = (0.5,),
                 batch_size: int = 4, score_min: float = 0.0,
                 verbose: bool = False,
                 plot_out: str | None = None,
                 return_detections: bool = False,
                 infer_fn: Callable | None = None,
                 mesh=None) -> Dict:
    """Run detection over `dataset` (items with image/boxes/image_size/scale
    fields, e.g. data.SKU110KDataset with flip_chance=0) and compute the
    reference metric suite (AP, AR@300, max-F1 P/R/C) per IoU threshold.

    Detections are mapped back to original image coordinates before
    matching, mirroring torchvision's postprocess rescale.
    """
    if infer_fn is None and mesh is not None:
        # DP batch inference: batch_size must divide over the mesh
        assert batch_size % mesh.devices.size == 0, (
            f"batch_size {batch_size} not divisible over "
            f"{mesh.devices.size} devices")
        infer_fn = make_variables_inference_fn(config, mesh)
    if infer_fn is not None:
        # pre-compiled (variables, images, sizes) fn shared across calls
        def infer(images, sizes):
            return infer_fn(variables, images, sizes)
    else:
        infer = make_inference_fn(variables, config)
    targets: List[np.ndarray] = []
    predictions: List[np.ndarray] = []
    confidences: List[np.ndarray] = []

    n = len(dataset)
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size, n))]
        b = len(items)
        if b < batch_size:  # pad batch for static shapes
            items = items + [items[-1]] * (batch_size - b)
        images = np.stack([it["image"] for it in items])
        sizes = np.stack([it["image_size"] for it in items]).astype(np.float32)
        res = infer(jnp.asarray(images), jnp.asarray(sizes))
        boxes = np.asarray(res["boxes"])
        scores = np.asarray(res["scores"])
        valid = np.asarray(res["valid"])
        for i, item in enumerate(items[:b]):
            keep = valid[i] & (scores[i] > score_min)
            targets.append(item["orig_boxes"])
            predictions.append(boxes[i][keep] / item["scale"])
            confidences.append(scores[i][keep])
        if verbose and (start // batch_size) % 20 == 0:
            print(f"eval {start}/{n}")

    res = M.calculate_metrics(targets, predictions, confidences,
                              iou_thresholds=thresholds)
    if plot_out:
        # P/R/F1-vs-recall curves per threshold (the reference's `plots`
        # flag, cvpce/proposals_eval.py + metrics.plot_prfc)
        from ..utils.viz import plot_prfc

        for t, d in res.items():
            raw = d["raw"]
            plot_prfc(raw["p"], raw["r"], raw["f"], raw["c"],
                      plot_out.replace(".png", f"_iou{t}.png"),
                      title=f"IoU {t}")
    if return_detections:
        return res, (targets, predictions, confidences)
    return res
