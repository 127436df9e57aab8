"""Proposal generation: GLN inference + fused on-device crop extraction.

Re-design of cvpce/production.py:8-20. The reference crops each detection
on the host in a Python list comprehension; here detection boxes stay on
device and all crops are one fused gather kernel (ops/image.crop_resize_square),
emitted at the classification size in tanh scale.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import transforms as T
from ..models.gln import GLN, GLNConfig, postprocess_detections
from ..ops.image import crop_resize_square_mxu, scale_to_tanh

Array = jnp.ndarray


class ProposalGenerator:
    def __init__(self, variables: Dict, config: GLNConfig,
                 confidence_threshold: float = 0.5,
                 max_proposals: int = 256, mesh=None,
                 input_norm: str = "imagenet"):
        """`mesh`: optional jax.sharding.Mesh — `detect_batch` shards the
        image batch over its first axis (variables replicated, placed
        once). Postprocess/NMS is per-image, so DP sharding is exact;
        the reference's production path is strictly single-GPU
        (cvpce/production.py:8-20).

        `input_norm`: the preprocessing the CHECKPOINT was trained with —
        "imagenet" (torchvision GeneralizedRCNNTransform semantics, what
        every reference checkpoint and the real-dataset loaders use) or
        "raw01" (images fed to the model in [0,1] as-is; the synthetic
        detection sets train this way). Serving with the wrong one is a
        silent domain shift that collapses precision (the round-2/3 e2e
        failure); resolve it from checkpoint metadata via
        pipeline.calibrate.resolve_input_norm."""
        self.config = config
        self.confidence_threshold = confidence_threshold
        self.max_proposals = max_proposals
        self.mesh = mesh
        if input_norm not in ("imagenet", "raw01"):
            raise ValueError(f"unknown input_norm: {input_norm!r}")
        self.input_norm = input_norm
        anchors, counts = config.anchors()
        model = GLN(config=config, train=False)

        @jax.jit
        def _infer(images: Array, image_sizes: Array) -> Dict[str, Array]:
            outputs = model.apply(variables, images)
            return postprocess_detections(outputs, jnp.asarray(anchors),
                                          counts, image_sizes, config)

        if mesh is not None:
            from ..eval.proposals import make_variables_inference_fn
            from ..parallel import put_replicated

            repl_vars = put_replicated(variables, mesh)
            vfn = make_variables_inference_fn(config, mesh)
            self._infer_batch = lambda imgs, sizes: vfn(
                repl_vars, imgs, sizes)
        else:
            self._infer_batch = _infer

        @functools.partial(jax.jit, static_argnames=())
        def _crops(image: Array, boxes: Array) -> Array:
            # image in [0,1]; crops -> tanh scale for the embedder.
            # MXU (einsum) resampler: gathers are ~60x slower on TPU.
            crops = crop_resize_square_mxu(image, boxes)
            return scale_to_tanh(crops)

        self._infer = _infer
        self._crops = _crops

    def detect(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """Run GLN on one image (HWC [0,1]). Returns canvas-space results
        mapped back to original image coordinates."""
        canvas, _, (ch, cw), scale = T.detection_canvas(
            image, None, self.config.canvas_h, self.config.canvas_w,
            normalize=self.input_norm == "imagenet")
        res = self._infer(canvas[None],
                          jnp.asarray([[ch, cw]], jnp.float32))
        boxes = np.asarray(res["boxes"][0]) / scale
        scores = np.asarray(res["scores"][0])
        valid = np.asarray(res["valid"][0])
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "gaussians": np.asarray(res["gaussians"][0])}

    def detect_batch(self, images) -> list:
        """`detect` over a batch of images in one device program. With a
        mesh, the batch shards across chips (padded up to a multiple of
        the mesh size; pad results dropped) — the pod-scale serving path
        for detection, complementing the sharded-gallery classifier
        (ops/knn_sharded.py) and spatial inference (parallel/spatial.py).
        """
        canvases, sizes, scales = [], [], []
        for image in images:
            canvas, _, (ch, cw), scale = T.detection_canvas(
                image, None, self.config.canvas_h, self.config.canvas_w,
                normalize=self.input_norm == "imagenet")
            canvases.append(canvas)
            sizes.append([ch, cw])
            scales.append(scale)
        n = len(canvases)
        pad = (-n) % self.mesh.devices.size if self.mesh is not None else 0
        batch = np.stack(canvases + [np.zeros_like(canvases[0])] * pad)
        size_arr = np.asarray(sizes + [[1.0, 1.0]] * pad, np.float32)
        res = self._infer_batch(jnp.asarray(batch), jnp.asarray(size_arr))
        out = []
        for i in range(n):
            out.append({
                "boxes": np.asarray(res["boxes"][i]) / scales[i],
                "scores": np.asarray(res["scores"][i]),
                "valid": np.asarray(res["valid"][i]),
                "gaussians": np.asarray(res["gaussians"][i]),
            })
        return out

    def generate_proposals(self, image: np.ndarray) -> np.ndarray:
        res = self.detect(image)
        keep = res["valid"] & (res["scores"] > self.confidence_threshold)
        return res["boxes"][keep]

    def _crop_boxes(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """Crop in chunks of <= max_proposals to bound device memory (a
        1000-detection image would otherwise materialize ~1 GB of crops
        at once)."""
        n = len(boxes)
        out = np.empty((n, 256, 256, 3), np.float32)
        step = self.max_proposals
        for start in range(0, n, step):
            chunk = boxes[start:start + step]
            c = len(chunk)
            pad_n = max(int(2 ** np.ceil(np.log2(max(c, 1)))), c)
            padded = np.zeros((pad_n, 4), np.float32)
            padded[:c] = chunk
            out[start:start + c] = np.asarray(
                self._crops(jnp.asarray(image), jnp.asarray(padded)))[:c]
        return out

    def detect_with_crops(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """Detection results above the confidence threshold, plus their
        classification-ready crops."""
        res = self.detect(image)
        keep = res["valid"] & (res["scores"] > self.confidence_threshold)
        boxes = res["boxes"][keep]
        scores = res["scores"][keep]
        if not len(boxes):
            crops = np.zeros((0, 256, 256, 3), np.float32)
        else:
            crops = self._crop_boxes(image, boxes)
        return {"boxes": boxes, "scores": scores, "crops": crops}

    def generate_proposals_and_images(self, image: np.ndarray
                                      ) -> Tuple[np.ndarray, np.ndarray]:
        """(boxes (N, 4), crops (N, 256, 256, 3) in tanh scale) —
        cvpce/production.py:16-20 contract."""
        res = self.detect_with_crops(image)
        return res["boxes"], res["crops"]
