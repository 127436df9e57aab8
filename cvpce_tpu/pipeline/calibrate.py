"""Serving-threshold calibration for the production detector.

The reference hardcodes score > 0.5 in its ProposalGenerator
(cvpce/production.py:14) and never validates that operating point; the
round-2 e2e report proved an uncalibrated threshold is the pipeline's
first-order error source (precision 0.46 at 0.5 on planogram scenes).
This module picks the max-F1 confidence threshold on a held-out split —
the metric stack already computes the F1-vs-confidence curve
(ops/metrics.py result fields f/p/r/c) — and persists it next to the
checkpoint so every serving surface (e2e scripts, eval CLIs,
ProposalGenerator callers) can run at the validated operating point.
"""
from __future__ import annotations

import json
from os import path
from typing import Dict, Optional

CALIBRATION_FILE = "serving_calibration.json"


def calibrate_confidence(variables: Dict, model_cfg, dataset,
                         iou_threshold: float = 0.5,
                         batch_size: int = 4,
                         infer_fn=None,
                         input_norm: str = "imagenet") -> Dict:
    """Sweep the detection-confidence operating point on `dataset`
    (held-out scenes) and return the max-F1 point.

    Returns {"threshold", "f1", "precision", "recall", "ap", "ar_300",
    "iou_threshold", "n_images", "input_norm"} — `threshold` is the
    confidence at max F1 (ops/metrics.py `c`).

    `input_norm` records the preprocessing the checkpoint expects
    ("imagenet" for real-dataset/reference checkpoints whose loaders
    normalize, "raw01" for the synthetic sets that feed [0,1] images);
    serving surfaces read it back via resolve_input_norm so the
    production ProposalGenerator preprocesses exactly like training did.
    """
    from ..eval.proposals import evaluate_gln

    res = evaluate_gln(variables, dataset, model_cfg,
                       thresholds=(iou_threshold,),
                       batch_size=batch_size, infer_fn=infer_fn)
    stats = res[iou_threshold]
    return {
        "threshold": float(stats["c"]),
        "f1": float(stats["f"]),
        "precision": float(stats["p"]),
        "recall": float(stats["r"]),
        "ap": float(stats["ap"]),
        "ar_300": float(stats["ar_300"]),
        "iou_threshold": float(iou_threshold),
        "n_images": len(dataset),
        "input_norm": input_norm,
    }


def save_calibration(checkpoint_dir: str, calibration: Dict) -> str:
    out = path.join(checkpoint_dir, CALIBRATION_FILE)
    with open(out, "w") as f:
        json.dump(calibration, f, indent=1)
    return out


def load_calibration(checkpoint_dir: str) -> Optional[Dict]:
    p = path.join(checkpoint_dir, CALIBRATION_FILE)
    if not path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def resolve_threshold(confidence, checkpoint_dir: Optional[str],
                      default: float = 0.5) -> float:
    """Serving-threshold resolution: an explicit number wins; 'auto'
    (or None) reads the checkpoint's calibration file and falls back to
    the reference's 0.5 when absent."""
    if confidence is not None and confidence != "auto":
        return float(confidence)
    if checkpoint_dir:
        cal = load_calibration(checkpoint_dir)
        if cal:
            return float(cal["threshold"])
    return default


def resolve_input_norm(checkpoint_dir: Optional[str],
                       default: str = "imagenet") -> str:
    """Preprocessing resolution for a checkpoint: reads `input_norm`
    from its calibration file; defaults to "imagenet" (every reference
    checkpoint trains behind torchvision's normalizing transform,
    torchvision GeneralizedRCNNTransform — cvpce/models/proposals.py
    builds on it). Synthetic-trained checkpoints record "raw01"."""
    if checkpoint_dir:
        cal = load_calibration(checkpoint_dir)
        if cal and "input_norm" in cal:
            return str(cal["input_norm"])
    return default


def calibration_dir_for_weights(weights: Optional[str]) -> Optional[str]:
    """Locate the directory whose calibration file governs `weights` —
    a GLN weights argument may be the training run dir, the rotating
    `checkpoint` subdir inside it, or a checkpoint file; the calibration
    json lives at the run-dir level (train_convergence --calibrate /
    save_calibration). Checks the path itself, then its parent; returns
    the first with a calibration file (or the innermost candidate, so
    resolve_threshold falls back to the default consistently)."""
    if weights is None:
        return None
    weights = path.abspath(weights)
    first = weights if path.isdir(weights) else path.dirname(weights)
    for d in (first, path.dirname(first)):
        if load_calibration(d):
            return d
    return first
