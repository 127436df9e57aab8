"""Vectorized box operations (jnp).

TPU-native replacement for the torchvision C++/CUDA box ops the reference
leans on (`torchvision.ops.box_iou` at cvpce/metrics.py:12 and
cvpce/planograms.py:224, `clip_boxes_to_image` at cvpce/production.py:102).
All functions are pure jnp, fixed-shape, and jit/vmap-safe.

Boxes are (..., 4) arrays in (x1, y1, x2, y2) corner format.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (N, 4) and (M, 4) xyxy boxes -> (N, M).

    Matches torchvision.ops.box_iou semantics (zero for disjoint boxes,
    degenerate boxes produce zero/NaN-free output via clamping).
    """
    area_a = box_area(boxes_a)  # (N,)
    area_b = box_area(boxes_b)  # (M,)

    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])  # (N, M, 2)
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (N, M)

    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip xyxy boxes to [0, width] x [0, height]."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_centers(boxes: jnp.ndarray) -> jnp.ndarray:
    """Centers (..., 2) of xyxy boxes, (cx, cy)."""
    return jnp.stack(
        [
            (boxes[..., 0] + boxes[..., 2]) * 0.5,
            (boxes[..., 1] + boxes[..., 3]) * 0.5,
        ],
        axis=-1,
    )


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def encode_boxes(reference: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode ground-truth `reference` boxes against anchor `proposals`.

    Standard R-CNN box coder (dx, dy, dw, dh), the same parameterization
    torchvision's RetinaNet uses (the reference inherits it wholesale at
    cvpce/models/proposals.py:162-175).
    """
    wx, wy, ww, wh = weights
    prop = xyxy_to_cxcywh(proposals)
    ref = xyxy_to_cxcywh(reference)
    dx = wx * (ref[..., 0] - prop[..., 0]) / prop[..., 2]
    dy = wy * (ref[..., 1] - prop[..., 1]) / prop[..., 3]
    dw = ww * jnp.log(ref[..., 2] / prop[..., 2])
    dh = wh * jnp.log(ref[..., 3] / prop[..., 3])
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 clip_value: float = 4.135166556742356) -> jnp.ndarray:
    """Decode regression deltas against anchors -> xyxy boxes.

    `clip_value` = log(1000/16), torchvision's bbox_xform_clip default.
    """
    wx, wy, ww, wh = weights
    anc = xyxy_to_cxcywh(anchors)
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, clip_value)
    dh = jnp.minimum(deltas[..., 3] / wh, clip_value)
    cx = dx * anc[..., 2] + anc[..., 0]
    cy = dy * anc[..., 3] + anc[..., 1]
    w = jnp.exp(dw) * anc[..., 2]
    h = jnp.exp(dh) * anc[..., 3]
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )
