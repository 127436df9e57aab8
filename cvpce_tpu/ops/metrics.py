"""Detection metrics: greedy matching, P/R, F1, 11-point VOC AP, AR@300.

Re-design of the reference metric stack (cvpce/metrics.py:11-138) for TPU:
the O(P*T) greedy confidence-ordered matching — a sequential double loop in
the reference (cvpce/metrics.py:15-33) — is re-expressed as a closed-form
vectorized computation (cumulative-OR over the IoU threshold mask), which is
bit-equivalent to the reference semantics and runs entirely on device with
static shapes. Aggregation (merge/sort/AP) is cheap O(total_preds) numpy on
host, mirroring cvpce/metrics.py:35-123.

Reference matching semantics being reproduced exactly
(cvpce/metrics.py:21-31): predictions are visited in descending-confidence
order; for each prediction, *every* not-yet-used target with IoU >= threshold
is marked used (the reference loop does not break after the first match), and
the prediction is a true positive iff it marked at least one target. Because
the set of targets marked used by prediction i is exactly {j : iou[i,j] >= t}
regardless of visit order, "used before prediction i" is a cumulative OR of
the threshold mask over predictions 0..i-1, and
    tp[i] = any_j(mask[i,j] & ~used_before[i,j]).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import pairwise_iou

Array = jnp.ndarray


def _bucket(n: int, minimum: int = 8) -> int:
    """Round up to the next power of two to bound jit recompiles."""
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("num_thresholds",))
def _match_kernel(ious: Array, pred_valid: Array, tgt_valid: Array,
                  thresholds: Array, num_thresholds: int) -> Array:
    """Vectorized greedy matcher.

    Args:
      ious: (P, T) IoU matrix, rows ordered by descending confidence.
      pred_valid: (P,) bool mask of real (non-padded) predictions.
      tgt_valid: (T,) bool mask of real targets.
      thresholds: (num_thresholds,) IoU thresholds.

    Returns:
      (num_thresholds, P) float32 true-positive indicators.
    """
    valid = pred_valid[:, None] & tgt_valid[None, :]

    def one_threshold(t):
        mask = (ious >= t) & valid  # (P, T)
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=0)
        used_before = (cum - mask.astype(jnp.int32)) > 0  # exclusive cum-OR
        tp = jnp.any(mask & ~used_before, axis=1)
        return tp.astype(jnp.float32) * pred_valid.astype(jnp.float32)

    return jax.vmap(one_threshold)(thresholds)


def match_detections(target_boxes: np.ndarray, pred_boxes: np.ndarray,
                     confidences: np.ndarray,
                     iou_thresholds: Sequence[float]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image matching: returns (tp[num_thr, P], sorted_conf[P]).

    Predictions are sorted by descending confidence (stable, so earlier
    predictions win ties — matching the reference's concat-then-sort order).
    """
    order = np.argsort(-np.asarray(confidences), kind="stable")
    pred_sorted = np.asarray(pred_boxes, dtype=np.float32)[order]
    conf_sorted = np.asarray(confidences, dtype=np.float32)[order]

    p, t = len(pred_sorted), len(target_boxes)
    pb, tb = _bucket(max(p, 1)), _bucket(max(t, 1))
    pred_pad = np.zeros((pb, 4), np.float32)
    pred_pad[:p] = pred_sorted
    tgt_pad = np.zeros((tb, 4), np.float32)
    tgt_pad[:t] = np.asarray(target_boxes, dtype=np.float32)
    pred_valid = np.arange(pb) < p
    tgt_valid = np.arange(tb) < t

    ious = pairwise_iou(jnp.asarray(pred_pad), jnp.asarray(tgt_pad))
    tp = _match_kernel(ious, jnp.asarray(pred_valid), jnp.asarray(tgt_valid),
                       jnp.asarray(list(iou_thresholds), dtype=jnp.float32),
                       len(iou_thresholds))
    return np.asarray(tp)[:, :p], conf_sorted


def precision_and_recall(tp: np.ndarray, fp: np.ndarray,
                         total_targets: int) -> Tuple[np.ndarray, np.ndarray]:
    """Cumulative precision/recall curves (cvpce/metrics.py:50-59)."""
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    denom = ctp + cfp
    precision = np.where(denom > 0, ctp / np.where(denom > 0, denom, 1), 0.0)
    if total_targets > 0:
        recall = ctp / total_targets
    else:
        recall = np.zeros_like(ctp)
    return precision, recall


def f_score(precision: np.ndarray, recall: np.ndarray) -> np.ndarray:
    """F1 curve with NaN->0 (cvpce/metrics.py:61-64)."""
    denom = precision + recall
    return np.where(denom > 0, 2 * precision * recall / np.where(denom > 0, denom, 1), 0.0)


def average_precision(precision: np.ndarray, recall: np.ndarray) -> float:
    """11-point interpolated VOC AP (cvpce/metrics.py:66-73)."""
    values = np.zeros(11, dtype=np.float64)
    for i, r in enumerate(np.linspace(0, 1, 11)):
        above = precision[recall >= r]
        if len(above) > 0:
            values[i] = above.max()
        else:
            break  # recall is non-decreasing: later levels are empty too
    return float(values.mean())


class StreamingMetrics:
    """Incremental metric accumulation — the evaluate-while-inferring
    pattern the reference needed a multiprocessing fan-out for
    (cvpce/metrics.py:140-175, which deadlocks under DDP —
    proposals_training.py:117). The per-image matcher here is a device op,
    so a plain accumulator suffices: call add() as results stream off the
    device, result() at the end.
    """

    def __init__(self, iou_thresholds: Sequence[float] = (0.5,)):
        self.thresholds = list(iou_thresholds)
        self._tp: List[np.ndarray] = []
        self._conf: List[np.ndarray] = []
        self._recall_300 = {t: [] for t in self.thresholds}
        self._total_targets = 0

    def add(self, target_boxes, pred_boxes, confidences) -> None:
        tgt = np.asarray(target_boxes, np.float32).reshape(-1, 4)
        pred = np.asarray(pred_boxes, np.float32).reshape(-1, 4)
        conf = np.asarray(confidences, np.float32).reshape(-1)
        tp, conf_sorted = match_detections(tgt, pred, conf, self.thresholds)
        self._tp.append(tp)
        self._conf.append(conf_sorted)
        self._total_targets += len(tgt)
        for ti, t in enumerate(self.thresholds):
            if len(conf_sorted) > 0 and len(tgt) > 0:
                r300 = np.cumsum(tp[ti][:300])[-1] / len(tgt)
            else:
                r300 = 0.0
            self._recall_300[t].append(float(r300))

    def result(self) -> Dict:
        merged_conf = (np.concatenate(self._conf)
                       if self._conf else np.zeros(0, np.float32))
        sort_idx = np.argsort(-merged_conf, kind="stable")
        merged_conf = merged_conf[sort_idx]
        res = {}
        for ti, t in enumerate(self.thresholds):
            tp = (np.concatenate([m[ti] for m in self._tp])
                  if self._tp else np.zeros(0, np.float32))[sort_idx]
            fp = 1.0 - tp
            p, r = precision_and_recall(tp, fp, self._total_targets)
            f = f_score(p, r)
            if len(f) > 0:
                mi = int(np.argmax(f))
                best = (float(f[mi]), float(p[mi]), float(r[mi]),
                        float(merged_conf[mi]))
            else:
                best = (0.0, 0.0, 0.0, 0.0)
            rc = self._recall_300[t]
            res[t] = {
                "raw": {"p": p, "r": r, "f": f, "c": merged_conf},
                "f": best[0], "p": best[1], "r": best[2], "c": best[3],
                "ap": average_precision(p, r),
                "ar_300": sum(rc) / len(rc) if rc else 0.0,
            }
        return res


def calculate_metrics(targets: Sequence, predictions: Sequence,
                      confidences: Sequence,
                      iou_thresholds: Sequence[float] = (0.5,)) -> Dict:
    """Corpus-level detection metrics.

    Same output schema as the reference (cvpce/metrics.py:92-123): per IoU
    threshold a dict with max-F1 `f`, precision/recall at max-F1 `p`/`r`,
    confidence at max-F1 `c`, 11-point `ap`, `ar_300`, and `raw` P/R/F1/conf
    curves. Inputs are per-image sequences of (T_i, 4) target boxes,
    (P_i, 4) predicted boxes and (P_i,) confidences (any array-likes).
    """
    acc = StreamingMetrics(iou_thresholds)
    for tgt, pred, conf in zip(targets, predictions, confidences):
        acc.add(tgt, pred, conf)
    return acc.result()
