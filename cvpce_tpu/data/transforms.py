"""Host-side image transforms (numpy/cv2), feeding fixed-shape device code.

This is the host half of the input pipeline. The reference lets
torchvision's GeneralizedRCNNTransform resize each batch dynamically on
GPU; for TPU we pre-resize every image into a static canvas on the host
(aspect preserved) and ship (canvas, content_size, scaled boxes) so every
jitted program sees one shape. Crops for classification are done on device
(ops/image.py); host variants exist here for dataset-level use
(cvpce/datautils.py:232-239 semantics).

Images are HWC float32 in [0, 1].
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

CLASSIFICATION_IMAGE_SIZE = 256
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _cv2():
    import cv2
    return cv2


def load_image(path: str) -> np.ndarray:
    """Decode an image file to HWC float32 RGB in [0, 1]."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        return np.asarray(img, np.float32) / 255.0


def load_image_rgba(path: str) -> np.ndarray:
    """Decode keeping alpha (for the internal trainset's BGRA PNGs,
    cvpce/datautils.py:453-482)."""
    cv2 = _cv2()
    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise OSError(f"cannot decode {path}")
    if raw.ndim == 2:
        raw = cv2.cvtColor(raw, cv2.COLOR_GRAY2BGRA)
    if raw.shape[2] == 3:
        raw = cv2.cvtColor(raw, cv2.COLOR_BGR2BGRA)
    rgba = cv2.cvtColor(raw, cv2.COLOR_BGRA2RGBA)
    return np.asarray(rgba, np.float32) / 255.0


def resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    cv2 = _cv2()
    return cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)


def scale_to_tanh(img: np.ndarray) -> np.ndarray:
    return img * 2.0 - 1.0


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def detection_canvas(
    img: np.ndarray,
    boxes: Optional[np.ndarray],
    canvas_h: int,
    canvas_w: int,
    min_size: int = 800,
    max_size: int = 1333,
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int], float]:
    """Aspect-preserving resize into a fixed canvas (torchvision
    GeneralizedRCNNTransform semantics: shorter side -> min_size, longer
    capped at max_size, additionally capped by the canvas itself).

    Returns (canvas HWC float32, scaled boxes, content (h, w), scale).
    """
    h, w = img.shape[:2]
    scale = min(min_size / min(h, w), max_size / max(h, w))
    scale = min(scale, canvas_h / h, canvas_w / w)
    new_h = min(int(round(h * scale)), canvas_h)
    new_w = min(int(round(w * scale)), canvas_w)
    resized = resize_bilinear_np(img, new_h, new_w)
    if normalize:
        resized = normalize_imagenet(resized)
    canvas = np.zeros((canvas_h, canvas_w, img.shape[2]), np.float32)
    canvas[:new_h, :new_w] = resized
    if boxes is not None and len(boxes):
        sboxes = np.asarray(boxes, np.float32).copy()
        sboxes[:, [0, 2]] *= new_w / w
        sboxes[:, [1, 3]] *= new_h / h
    else:
        sboxes = np.zeros((0, 4), np.float32)
    return canvas, sboxes, (new_h, new_w), scale


def resize_for_classification(img: np.ndarray,
                              size: int = CLASSIFICATION_IMAGE_SIZE,
                              pad_value: float = 0.5) -> np.ndarray:
    """Square-pad (bottom/right) with gray then resize to `size`
    (cvpce/datautils.py:234-239)."""
    h, w = img.shape[:2]
    side = max(h, w)
    canvas = np.full((side, side, img.shape[2]), pad_value, np.float32)
    canvas[:h, :w] = img
    return resize_bilinear_np(canvas, size, size)


def aspect_resize_pad(img: np.ndarray, size: int = CLASSIFICATION_IMAGE_SIZE,
                      tanh: bool = True,
                      mask: Optional[np.ndarray] = None):
    """GP-train tensorize semantics (cvpce/datautils.py:397-415): resize so
    the longer side == size, optional tanh scale, pad bottom/right (fill 0
    tanh / 0.5 plain; mask pads with 1).

    Returns image (size, size, 3) [+ mask (size, size, 1) if given].
    """
    h, w = img.shape[:2]
    if h > w:
        new_h, new_w = size, int(round(size * w / h))
    else:
        new_h, new_w = int(round(size * h / w)), size
    resized = resize_bilinear_np(img, new_h, new_w)
    if resized.ndim == 2:
        resized = resized[..., None]
    if tanh:
        resized = scale_to_tanh(resized)
    fill = 0.0 if tanh else 0.5
    out = np.full((size, size, resized.shape[2]), fill, np.float32)
    out[:new_h, :new_w] = resized
    if mask is not None:
        m = resize_bilinear_np(mask.astype(np.float32), new_h, new_w)
        m_out = np.ones((size, size, 1), np.float32)
        m_out[:new_h, :new_w, 0] = m
        return out, m_out
    return out


def build_white_background_mask(img: np.ndarray,
                                tolerance: float = 1e-2) -> np.ndarray:
    """Mask of the white background via gradient flood fill from white
    corners (cvpce/utils.py:300-311, skimage sobel+flood re-done with cv2).

    img: HWC float RGB in [0, 1]. Returns (H, W) bool, True = background.
    """
    cv2 = _cv2()
    gray = img[..., 0] * 0.2989 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    h, w = gray.shape
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3) / 8.0
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3) / 8.0
    grad = np.sqrt(gx**2 + gy**2)

    mask = np.zeros((h, w), bool)
    corners = [(0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1)]
    flood_flags = 4 | cv2.FLOODFILL_MASK_ONLY | (1 << 8)
    for x, y in corners:
        if gray[y, x] < 1 - tolerance or mask[y, x]:
            continue
        ff_mask = np.zeros((h + 2, w + 2), np.uint8)
        cv2.floodFill(grad.copy(), ff_mask, (x, y), 0,
                      loDiff=tolerance, upDiff=tolerance, flags=flood_flags)
        mask |= ff_mask[1:-1, 1:-1].astype(bool)
    return mask


def hflip_with_boxes(img: np.ndarray, boxes: np.ndarray):
    """Horizontal flip + box remap (cvpce/datautils.py:87-99)."""
    w = img.shape[1]
    flipped = img[:, ::-1].copy()
    fboxes = boxes.copy()
    if len(boxes):
        fboxes[:, 0] = w - boxes[:, 2]
        fboxes[:, 2] = w - boxes[:, 0]
    return flipped, fboxes
