"""RetinaNet anchor generation (host-side numpy, precomputed per canvas).

Reproduces torchvision's AnchorGenerator semantics, which the reference
inherits through RetinaNet (cvpce/models/proposals.py:162-166): per level
P3..P7 sizes s, s*2^(1/3), s*2^(2/3) with s = 32..512, aspect ratios
(0.5, 1.0, 2.0); base anchors rounded; grid shifts at integer multiples of
the stride (no half-stride offset). Anchors are computed once per static
canvas and fed to the jitted train/eval steps as a constant.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

LEVELS = (3, 4, 5, 6, 7)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
SCALE_OCTAVES = (0.0, 1.0 / 3.0, 2.0 / 3.0)


def level_sizes(level: int) -> Tuple[float, ...]:
    base = 2.0 ** (level + 2)
    return tuple(base * 2.0**o for o in SCALE_OCTAVES)


def cell_anchors(level: int) -> np.ndarray:
    """(A, 4) zero-centered anchors for one level; A = ratios x scales.

    Iteration order matches torchvision: aspect ratios outer, scales inner,
    and the result is rounded.
    """
    scales = np.asarray(level_sizes(level), np.float64)
    ratios = np.asarray(ASPECT_RATIOS, np.float64)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
    return np.round(base).astype(np.float32)


def grid_anchors(canvas_h: int, canvas_w: int,
                 levels: Sequence[int] = LEVELS) -> Tuple[np.ndarray, List[int]]:
    """All anchors for a canvas.

    Returns (anchors (A_total, 4) float32 xyxy, per-level counts). Per-level
    layout is row-major over (y, x) grid cells with all A cell anchors
    contiguous per cell — the same flattening order as the head outputs.
    """
    all_anchors = []
    counts = []
    for level in levels:
        stride = 2**level
        gh = int(np.ceil(canvas_h / stride))
        gw = int(np.ceil(canvas_w / stride))
        base = cell_anchors(level)  # (A, 4)
        shift_x = np.arange(gw, dtype=np.float32) * stride
        shift_y = np.arange(gh, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)  # (gh, gw)
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None]).reshape(-1, 4)
        all_anchors.append(anchors)
        counts.append(len(anchors))
    return np.concatenate(all_anchors, axis=0), counts
