"""Anchor <-> ground-truth matching (torchvision Matcher semantics).

The reference inherits torchvision's Matcher(0.5, 0.4,
allow_low_quality_matches=True) through RetinaNet. For each anchor: the
best-IoU gt wins if IoU >= 0.5 (foreground), IoU < 0.4 is background, in
between is ignored; additionally every gt's globally-best anchor(s) are
forced to foreground ("low quality matches").

The A x T IoU matrix (A ~ 200k anchors, T up to ~700 boxes on SKU-110K) is
computed in anchor chunks under lax.map so HBM stays bounded; exact fp
equality against the per-gt max reproduces torchvision's
`iou == best_per_gt` selection bit-for-bit because both passes compute
identical values.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

Array = jnp.ndarray

BELOW_LOW = -1
BETWEEN = -2


@functools.partial(jax.jit, static_argnames=("chunk", "allow_low_quality"))
def match_anchors(anchors: Array, gt_boxes: Array, gt_valid: Array,
                  high_threshold: float = 0.5, low_threshold: float = 0.4,
                  allow_low_quality: bool = True, chunk: int = 8192):
    """Match anchors to gt boxes.

    Args:
      anchors: (A, 4) xyxy; A must be a multiple of `chunk` (pad upstream).
      gt_boxes: (T, 4) padded gt boxes.
      gt_valid: (T,) bool.

    Returns:
      matched_idx: (A,) int32 — index of the matched gt for every anchor
        (argmax IoU; only meaningful where fg).
      fg: (A,) bool — anchor is foreground.
      valid: (A,) bool — anchor participates in the cls loss (not ignored).
    """
    a = anchors.shape[0]
    num_chunks = a // chunk
    anchors_c = anchors.reshape(num_chunks, chunk, 4)

    neg = jnp.where(gt_valid, 0.0, -1.0)[None, :]  # invalidate padded gts

    def chunk_stats(chunk_anchors):
        ious = pairwise_iou(chunk_anchors, gt_boxes)  # (chunk, T)
        ious = jnp.where(gt_valid[None, :], ious, neg)
        best_gt = jnp.argmax(ious, axis=1).astype(jnp.int32)
        best_iou = jnp.max(ious, axis=1)
        per_gt_max = jnp.max(ious, axis=0)  # (T,)
        return best_gt, best_iou, per_gt_max

    best_gt, best_iou, per_gt_max = jax.lax.map(chunk_stats, anchors_c)
    per_gt_max = jnp.max(per_gt_max, axis=0)  # (T,) global

    if allow_low_quality:
        def chunk_lq(chunk_anchors):
            ious = pairwise_iou(chunk_anchors, gt_boxes)
            ious = jnp.where(gt_valid[None, :], ious, neg)
            # anchor ties the global max for some valid gt (and overlaps it)
            is_best = (ious == per_gt_max[None, :]) & gt_valid[None, :] \
                & (ious > 0)
            return jnp.any(is_best, axis=1)

        low_quality = jax.lax.map(chunk_lq, anchors_c).reshape(a)
    else:
        low_quality = jnp.zeros(a, bool)

    best_gt = best_gt.reshape(a)
    best_iou = best_iou.reshape(a)

    fg = (best_iou >= high_threshold) | low_quality
    between = (best_iou >= low_threshold) & (best_iou < high_threshold) \
        & ~low_quality
    valid = ~between
    return best_gt, fg, valid
