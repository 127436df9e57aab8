"""Loss functions for GLN and DIHE training, all fixed-shape jnp.

- sigmoid focal loss + L1 box regression: semantics of torchvision 0.9's
  RetinaNet losses, inherited by the reference (cvpce/models/proposals.py:169
  adds `loss['gaussian']` on top of them).
- gaussian heatmap loss with hard-negative mining: re-design of
  cvpce/models/proposals.py:141-160 — the dynamic top-k over negatives
  (k = max(1000, 3 * #pos)) becomes a full sort + prefix-sum indexed at a
  traced k, keeping shapes static.
- hierarchical triplet loss + ZNCC: re-design of
  cvpce/classification_training.py:151-202 (the reference's Python
  double-loop ZNCC becomes one vectorized reduction).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import cosine_distance

Array = jnp.ndarray


def sigmoid_focal_loss(logits: Array, targets: Array, alpha: float = 0.25,
                       gamma: float = 2.0) -> Array:
    """Elementwise sigmoid focal loss (Lin et al. 2017), torchvision
    formulation."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    """Numerically-stable binary CE with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def gaussian_heatmap_loss(predictions: Array, targets: Array,
                          tanh: bool = False,
                          negative_threshold: float = 0.0,
                          positive_threshold: float = 0.1,
                          min_negatives: int = 1000,
                          negatives_per_positive: int = 3) -> Array:
    """MSE with hard-negative mining over the whole batch.

    Args:
      predictions: (B, h, w) or (B, h, w, 1) predicted heatmaps.
      targets: same shape — already rendered at prediction resolution with
        the fill value (-1 tanh / 0 plain) outside image content.

    Keeps reference semantics (cvpce/models/proposals.py:150-160): squared
    errors at positive pixels (target >= pos_thresh) all count; negative
    pixels (target <= neg_thresh) contribute their top
    max(min_negatives, 3 * #pos) errors; normalize by #pos + #neg_kept.
    """
    pred = predictions.reshape(-1)
    tgt = targets.reshape(-1)
    se = (pred - tgt) ** 2

    pos_mask = tgt >= positive_threshold
    neg_mask = tgt <= negative_threshold

    n_pos = pos_mask.sum()
    pos_sum = jnp.where(pos_mask, se, 0.0).sum()

    neg_se = jnp.where(neg_mask, se, -1.0)  # SE >= 0, so -1 sorts last
    neg_sorted = -jnp.sort(-neg_se)  # descending
    neg_cumsum = jnp.cumsum(jnp.where(neg_sorted >= 0, neg_sorted, 0.0))

    n_neg_avail = neg_mask.sum()
    n_top = jnp.maximum(min_negatives, negatives_per_positive * n_pos)
    n_top = jnp.minimum(n_top, n_neg_avail)
    neg_sum = jnp.where(n_top > 0, neg_cumsum[jnp.maximum(n_top - 1, 0)], 0.0)

    denom = jnp.maximum(n_pos + n_top, 1)
    return (pos_sum + neg_sum) / denom


def hierarchy_similarity_matrix(pos_depth: Array, shared_prefix: Array,
                                neg_is_prefix: Array) -> Array:
    """Not used directly — hierarchy similarity is computed host-side on
    string paths (see train/dihe.py); kept for API completeness."""
    sim = shared_prefix / jnp.maximum(pos_depth, 1)
    return jnp.where(neg_is_prefix, 1.0, sim)


def hierarchical_triplet_loss(anchor_emb: Array, pos_emb: Array,
                              neg_emb: Array, similarity: Array,
                              min_margin: float = 0.05,
                              max_margin: float = 0.5) -> Array:
    """Adaptive-margin triplet hinge on cosine distances
    (cvpce/classification_training.py:196-202; margins from Tonioni).

    similarity: (B,) hierarchy similarity in [0, 1] between positive and
    negative paths — computed host-side from category paths
    (classification_training.py:181-194).
    """
    margin = min_margin + (1.0 - similarity) * (max_margin - min_margin)
    d_pos = cosine_distance(anchor_emb, pos_emb, axis=1)
    d_neg = cosine_distance(anchor_emb, neg_emb, axis=1)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()


def zncc(a: Array, b: Array, eps: float = 1e-8) -> Array:
    """Zero-normalized cross-correlation, reference normalization.

    Vectorized replacement for the per-image/per-channel Python double loop
    at cvpce/classification_training.py:151-163, reproducing its exact
    scale: per (image, channel), sum((a-mean_a)(b-mean_b)) / (std_a*std_b)
    with unbiased stds, summed and divided by B*C*H*W (so the value
    approaches mean correlation * (N-1)/N). Inputs (B, H, W, C).
    """
    bsz, ch = a.shape[0], a.shape[-1]
    n = a.reshape(bsz, -1, ch).shape[1]
    af = a.reshape(bsz, -1, ch)
    bf = b.reshape(bsz, -1, ch)
    ac = af - af.mean(axis=1, keepdims=True)
    bc = bf - bf.mean(axis=1, keepdims=True)
    num = (ac * bc).sum(axis=1)  # (B, C)
    denom = jnp.sqrt(((ac**2).sum(axis=1) / (n - 1))
                     * ((bc**2).sum(axis=1) / (n - 1)))
    terms = num / jnp.maximum(denom, eps)
    return terms.sum() / (bsz * ch * n)


def masked_zncc(a: Array, b: Array, mask: Array, eps: float = 1e-8) -> Array:
    """ZNCC over masked pixels only, reference normalization
    (cvpce/classification_training.py:165-179): per-(image, channel) sums
    over mask==1 pixels with unbiased masked stds, total divided by the
    UNMASKED element count B*C*H*W (the reference divides by
    prod(images.shape)).

    mask: (B, H, W) or (B, H, W, 1), 1 = include pixel.
    """
    if mask.ndim == 3:
        mask = mask[..., None]
    bsz, ch = a.shape[0], a.shape[-1]
    m = mask.reshape(bsz, -1, 1)
    af = a.reshape(bsz, -1, ch)
    bf = b.reshape(bsz, -1, ch)
    n_total = af.shape[1]
    nm = jnp.maximum(m.sum(axis=1), 2.0)  # (B, 1)
    am = (af * m).sum(axis=1, keepdims=True) / nm[:, None]
    bm = (bf * m).sum(axis=1, keepdims=True) / nm[:, None]
    ac = (af - am) * m
    bc = (bf - bm) * m
    num = (ac * bc).sum(axis=1)  # (B, C)
    denom = jnp.sqrt(((ac**2).sum(axis=1) / (nm - 1))
                     * ((bc**2).sum(axis=1) / (nm - 1)))
    terms = num / jnp.maximum(denom, eps)
    return terms.sum() / (bsz * ch * n_total)
