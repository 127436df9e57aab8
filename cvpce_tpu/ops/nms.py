"""Fixed-shape NMS for XLA: hard NMS and Soft-NMS over static-size inputs.

TPU-native replacement for torchvision's C++/CUDA `batched_nms`, which the
reference inherits inside RetinaNet's postprocessing
(cvpce/models/proposals.py:162-181 subclasses torchvision RetinaNet; NMS
happens in its postprocess_detections). Dynamic output shapes are avoided:
inputs are padded to a static N, outputs are (N,) keep masks / re-scored
score vectors, and callers take a static top-k afterwards.

The O(N^2) IoU matrix is one shot of vectorized jnp; the sequential
suppression order is a `fori_loop` over candidates (N is the
detections-per-image cap, 1000 in the reference — models/proposals.py:165).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnames=())
def nms_mask(boxes: Array, scores: Array, valid: Array,
             iou_threshold: float = 0.5) -> Array:
    """Greedy hard-NMS keep mask.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,) confidence; padded entries should carry -inf or have
        valid=False.
      valid: (N,) bool.
      iou_threshold: suppression threshold (torchvision RetinaNet default
        0.5, inherited by the reference).

    Returns:
      (N,) bool keep mask (in the original input order).
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)  # descending
    boxes_s = boxes[order]
    valid_s = valid[order]

    iou = pairwise_iou(boxes_s, boxes_s)

    def body(i, suppressed):
        # If candidate i survives, it suppresses all lower-ranked overlaps.
        alive = ~suppressed[i] & valid_s[i]
        row = (iou[i] > iou_threshold) & (jnp.arange(n) > i)
        return jnp.where(alive, suppressed | row, suppressed)

    suppressed = jax.lax.fori_loop(0, n, body, ~valid_s)
    keep_sorted = ~suppressed & valid_s
    # scatter back to input order
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


@functools.partial(jax.jit, static_argnames=("method",))
def soft_nms_scores(boxes: Array, scores: Array, valid: Array,
                    sigma: float = 0.5, iou_threshold: float = 0.5,
                    method: str = "gaussian") -> Array:
    """Soft-NMS re-scoring (Bodla et al. 2017), fixed shape.

    Sequentially picks the current max-score box and decays the scores of
    its overlaps, either with a Gaussian penalty exp(-iou^2/sigma) or the
    linear (1 - iou) rule above `iou_threshold`. Returns the re-scored (N,)
    vector; callers threshold / top-k it.
    """
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    live_scores = jnp.where(valid, scores, neg_inf)

    def body(_, state):
        cur_scores, processed = state
        cand = jnp.where(processed, neg_inf, cur_scores)
        i = jnp.argmax(cand)
        row = iou[i]
        if method == "gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        else:
            decay = jnp.where(row > iou_threshold, 1.0 - row, 1.0)
        decay = jnp.where(processed | (jnp.arange(n) == i), 1.0, decay)
        new_scores = cur_scores * decay
        new_scores = jnp.where(jnp.arange(n) == i, cur_scores, new_scores)
        return new_scores, processed.at[i].set(True)

    final_scores, _ = jax.lax.fori_loop(
        0, n, body, (live_scores, ~valid)
    )
    return jnp.where(valid, final_scores, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def nms_topk(boxes: Array, scores: Array, valid: Array, k: int,
             iou_threshold: float = 0.5):
    """Hard NMS + static top-k: returns (boxes (k,4), scores (k,), valid (k,))."""
    keep = nms_mask(boxes, scores, valid, iou_threshold)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(kept_scores, k)
    out_valid = jnp.isfinite(top_scores)
    return boxes[idx], jnp.where(out_valid, top_scores, 0.0), out_valid


@jax.jit
def merge_boxes(boxes: Array, scores: Array, valid: Array, keep: Array,
                iou_threshold: float = 0.5) -> Array:
    """Score-weighted box merging (EM-merge / box-voting variant).

    After NMS, each surviving box is refined to the score-weighted mean of
    all detections it suppressed (IoU > threshold) — the fixed-shape
    analogue of SKU-110K-style EM merging of overlapping detections
    (BASELINE.json lists Soft-NMS/EM merge as hot post-processing). One
    (K, N) IoU matrix + one matmul; no loops.
    """
    iou = pairwise_iou(boxes, boxes)  # (N, N)
    # self-weight included via the IoU diagonal (iou[i, i] == 1)
    w = jnp.where(
        keep[:, None] & valid[None, :] & (iou > iou_threshold),
        iou * scores[None, :], 0.0,
    )
    total = jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    merged = (w @ boxes) / total
    return jnp.where(keep[:, None], merged, boxes)
