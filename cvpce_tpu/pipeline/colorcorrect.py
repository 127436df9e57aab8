"""Scene-statistics photometric correction for the serving classify leg.

The deployment domain gap the reference's GAN bridges
(/root/reference/cvpce/classification_training.py:303-320: clean web
renders vs shelf photos) is, on real cameras, dominated by global
photometric state — white-balance cast, exposure curve, uneven store
lighting. Those are SCENE-level nuisances: every crop in one photo
shares them, and the full scene carries enough statistics to estimate
them, where a single 256x256 crop does not (a lone red package under a
red cast is ambiguous; a whole shelf is not).

This module estimates and removes the scene-level component before
crops reach the embedder:

1. gray-world gains  — per-channel gain g_c = mean(luma) / mean(c)
   (the classic white-balance assumption) undoes the color cast.
2. illumination field — divide luma by its heavily-blurred copy
   normalized to unit mean (single-scale Retinex) to flatten smooth
   lighting gradients.

Both operations are host-side numpy/cv2 (one scene per evaluation, a
few ms at 832x1344) and act only on the classification leg: the
detector is served shift-augmented, so its input stays raw. The
gallery's clean renders are near-neutral already, so correction maps
queries TOWARD the index's domain rather than inventing a third one.

Measured (scripts/probe_colorcorrect.py, mean-RGB NN probe at shift
0.7 + perspective 0.5, 64 archetypes, 292 crops): raw 0.226 /
gains-only 0.281 / gains+field 0.247 vs the clean-scene ceiling 0.322
— gray-world gains recover ~57% of the photometric identity loss,
while the Retinex field HURTS classification despite lowering pixel
MAE (products imprint themselves on the estimated field), so
`flatten_illumination` defaults to False.
"""
from __future__ import annotations

import numpy as np

from ..data import transforms as T

_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def estimate_gray_world_gains(img: np.ndarray) -> np.ndarray:
    """Per-channel gains that equalize channel means to the luma mean.

    img: HWC float32 [0, 1]. Returns (3,) float32 gains, clipped to
    [0.5, 2.0] so a legitimately colorful scene can't be destroyed.
    """
    means = img.reshape(-1, 3).mean(axis=0)
    target = float(means @ _LUMA / _LUMA.sum())
    gains = target / np.clip(means, 1e-4, None)
    return np.clip(gains, 0.5, 2.0).astype(np.float32)


def estimate_illumination_field(img: np.ndarray,
                                sigma_frac: float = 0.12) -> np.ndarray:
    """Smooth multiplicative lighting field, unit mean, shape (H, W, 1).

    Single-scale Retinex: the luma channel blurred with a Gaussian whose
    sigma is `sigma_frac * min(H, W)` — wide enough that products
    (<~10% of the canvas) do not imprint themselves on the field, narrow
    enough to track store-lighting gradients. Clipped to [0.5, 2.0].
    """
    cv2 = T._cv2()
    luma = img.astype(np.float32) @ _LUMA
    sigma = max(2.0, sigma_frac * min(img.shape[:2]))
    field = cv2.GaussianBlur(luma, (0, 0), sigmaX=sigma, sigmaY=sigma)
    field = field / max(float(field.mean()), 1e-4)
    return np.clip(field, 0.5, 2.0)[..., None].astype(np.float32)


def gallery_feedback_gains(crop_means: np.ndarray,
                           matched_gallery_means: np.ndarray) -> np.ndarray:
    """Self-calibrating white balance against the catalog.

    Gray-world assumes the scene averages to neutral; the pipeline can
    do better, because it HOLDS the deployment gallery: classify the
    crops once, then estimate the scene's cast as the median per-channel
    ratio between each crop's color and its matched gallery entry's
    color, and re-classify under the corrected cast. The median is
    robust to misclassified crops as long as the majority match (at
    top-1 >=0.5 the majority's ratios all estimate the SAME scene-level
    cast, while errors scatter) — an EM step whose E is the classifier.

    crop_means / matched_gallery_means: (N, 3) center-region mean RGB of
    each detected crop ([0,1] scale) and of the gallery render of its
    predicted label. Returns (3,) gains, clipped to [0.5, 2.0].
    """
    ratios = matched_gallery_means / np.clip(crop_means, 1e-3, None)
    gains = np.median(ratios, axis=0)
    return np.clip(gains, 0.5, 2.0).astype(np.float32)


def center_mean_rgb(img01: np.ndarray) -> np.ndarray:
    """Mean RGB of the central half-crop (border/neighbor-free)."""
    h, w = img01.shape[:2]
    return img01[h // 4: 3 * h // 4, w // 4: 3 * w // 4].reshape(
        -1, 3).mean(axis=0)


def scene_color_correct(img: np.ndarray,
                        flatten_illumination: bool = False) -> np.ndarray:
    """Remove the scene-level photometric state from a shelf photo.

    Returns a corrected copy (HWC float32 [0, 1]); the input is not
    modified. Near-neutral, evenly-lit scenes pass through almost
    unchanged (gains ~1, field ~1), so applying this unconditionally at
    serving is safe for in-domain inputs.
    """
    out = img.astype(np.float32)
    if flatten_illumination:
        out = out / estimate_illumination_field(out)
    out = out * estimate_gray_world_gains(out)
    return np.clip(out, 0.0, 1.0)
