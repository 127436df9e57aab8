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
                 max_proposals: int = 256):
        self.config = config
        self.confidence_threshold = confidence_threshold
        self.max_proposals = max_proposals
        anchors, counts = config.anchors()
        model = GLN(config=config, train=False)

        @jax.jit
        def _infer(images: Array, image_sizes: Array) -> Dict[str, Array]:
            outputs = model.apply(variables, images)
            return postprocess_detections(outputs, jnp.asarray(anchors),
                                          counts, image_sizes, config)

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
            image, None, self.config.canvas_h, self.config.canvas_w)
        res = self._infer(canvas[None],
                          jnp.asarray([[ch, cw]], jnp.float32))
        boxes = np.asarray(res["boxes"][0]) / scale
        scores = np.asarray(res["scores"][0])
        valid = np.asarray(res["valid"][0])
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "gaussians": np.asarray(res["gaussians"][0])}

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
