"""Deterministic synthetic shelf scenes for convergence runs and benches.

The reference validates on SKU-110K (densely packed retail shelves,
~150 boxes/image — cvpce/datautils.py:130-267); no real datasets ship in
this environment, so these scenes stand in: horizontal shelf bands packed
with rectangular "products" (solid base color, darker border, stripe
texture) over a noisy background. Detection is learnable (strong product
edges) but not trivial (color/size/stripe variation, touching boxes).

Everything is seeded numpy — the same (seed, index) always yields the
same scene, so benches and tests are reproducible.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def shelf_scene(h: int, w: int, rng: np.random.Generator,
                min_shelves: int = 4, max_shelves: int = 8,
                fill: float = 0.92) -> Tuple[np.ndarray, np.ndarray]:
    """Render one shelf scene. Returns (image [h,w,3] float32 in [0,1],
    boxes [n,4] float32 xyxy)."""
    img = np.empty((h, w, 3), np.float32)
    # background: vertical gradient + per-pixel noise
    base = rng.uniform(0.25, 0.5)
    grad = np.linspace(base, base + rng.uniform(-0.1, 0.1), h,
                       dtype=np.float32)
    img[:] = grad[:, None, None]
    img += rng.normal(0, 0.02, (h, w, 3)).astype(np.float32)

    n_shelves = int(rng.integers(min_shelves, max_shelves + 1))
    edges = np.linspace(0, h, n_shelves + 1).astype(int)
    boxes = []
    for s in range(n_shelves):
        top, bottom = edges[s], edges[s + 1]
        shelf_h = bottom - top
        # shelf board
        board = max(2, shelf_h // 12)
        img[bottom - board:bottom] = rng.uniform(0.1, 0.2)
        x = int(rng.integers(0, max(1, w // 40)))
        row_h = shelf_h - board
        while x < w - 8:
            pw = int(rng.uniform(0.02, 0.07) * w)
            pw = max(6, min(pw, w - x - 1))
            ph = int(rng.uniform(0.65, 0.95) * row_h)
            ph = max(6, ph)
            y2 = bottom - board
            y1 = y2 - ph
            if rng.random() < fill:
                color = rng.uniform(0.15, 0.95, 3).astype(np.float32)
                img[y1:y2, x:x + pw] = color
                # darker border
                b = max(1, pw // 12)
                img[y1:y1 + b, x:x + pw] *= 0.5
                img[y2 - b:y2, x:x + pw] *= 0.5
                img[y1:y2, x:x + b] *= 0.5
                img[y1:y2, x + pw - b:x + pw] *= 0.5
                # stripe texture (label band)
                if rng.random() < 0.7:
                    band_y = y1 + int(0.3 * ph)
                    band_h = max(1, ph // 5)
                    img[band_y:band_y + band_h, x + b:x + pw - b] = \
                        rng.uniform(0.1, 0.9, 3).astype(np.float32)
                boxes.append([x, y1, x + pw, y2])
            x += pw + int(rng.integers(1, max(2, w // 100)))
    img = np.clip(img, 0.0, 1.0)
    if not boxes:
        boxes = [[0, 0, 8, 8]]
    return img, np.asarray(boxes, np.float32)


class SyntheticShelfDataset:
    """SKU110K-shaped items (image/boxes/image_size/scale/orig_boxes)
    rendered directly at canvas size (scale=1) — drop-in for the training
    loop and evaluate_gln."""

    def __init__(self, n: int, canvas_h: int = 832, canvas_w: int = 1344,
                 seed: int = 0, min_shelves: int = 4, max_shelves: int = 8):
        self.n = n
        self.canvas_h = canvas_h
        self.canvas_w = canvas_w
        self.seed = seed
        self.min_shelves = min_shelves
        self.max_shelves = max_shelves

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> Dict:
        if not 0 <= i < self.n:
            raise IndexError(i)
        rng = np.random.default_rng((self.seed, i))
        img, boxes = shelf_scene(self.canvas_h, self.canvas_w, rng,
                                 self.min_shelves, self.max_shelves)
        return {
            "image": img,
            "boxes": boxes,
            "image_size": np.array([self.canvas_h, self.canvas_w],
                                   np.int32),
            "scale": np.float32(1.0),
            "name": f"synthetic_{i}",
            "orig_boxes": boxes.copy(),
            "orig_size": np.array([self.canvas_h, self.canvas_w], np.int32),
        }
