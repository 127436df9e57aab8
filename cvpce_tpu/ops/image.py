"""Device-side image ops: crop + square-pad + resize, normalization.

The reference does per-box crop and square-pad-resize on the host with a
Python list comprehension per detection (cvpce/production.py:20,
cvpce/datautils.py:232-239: pad to square with 0.5 gray, bilinear resize to
256). Here the crop+pad+resize is a single fused gather-based bilinear
sampling over a batch of boxes — one jitted op for all detections of an
image, no host round-trip.

Images are HWC float32 in [0, 1] unless noted.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray

CLASSIFICATION_IMAGE_SIZE = 256  # cvpce/datautils.py:232
PAD_VALUE = 0.5  # gray padding, cvpce/datautils.py:237

# ImageNet stats rescaled to the [-1, 1] tanh range, exactly as the MACVGG
# embedder normalizes its input (cvpce/models/classification.py:41-44).
TANH_IMAGENET_MEAN = (0.485 * 2 - 1, 0.456 * 2 - 1, 0.406 * 2 - 1)
TANH_IMAGENET_STD = (0.229 * 2, 0.224 * 2, 0.225 * 2)


def scale_to_tanh(x: Array) -> Array:
    """[0, 1] -> [-1, 1] (cvpce/utils.py:280-281)."""
    return x * 2.0 - 1.0


def scale_from_tanh(x: Array) -> Array:
    """[-1, 1] -> [0, 1] (cvpce/utils.py:283-284)."""
    return (x + 1.0) * 0.5


def normalize_tanh_imagenet(x: Array) -> Array:
    """Normalize a [-1, 1]-scaled image with rescaled ImageNet stats."""
    mean = jnp.asarray(TANH_IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(TANH_IMAGENET_STD, x.dtype)
    return (x - mean) / std


def _bilinear_gather(image: Array, sx: Array, sy: Array) -> Array:
    """Sample HWC `image` at fractional coords (sy, sx) -> (..., C).

    Coordinates are clamped to the image (edge padding), matching
    torch bilinear resize (align_corners=False) behavior at borders.
    """
    h, w = image.shape[0], image.shape[1]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    lx = (sx - x0)[..., None]
    ly = (sy - y0)[..., None]
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    return ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
            + ly * (1 - lx) * v10 + ly * lx * v11)


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_resize_square(image: Array, boxes: Array,
                       out_size: int = CLASSIFICATION_IMAGE_SIZE) -> Array:
    """Fused crop -> pad-to-square(0.5) -> bilinear resize for many boxes.

    Args:
      image: (H, W, C) float source image.
      boxes: (B, 4) xyxy boxes; coordinates are truncated to integers first
        (the reference indexes with boxes.to(torch.long),
        cvpce/production.py:20).

    Returns:
      (B, out_size, out_size, C) crops; regions beyond the (right/bottom)
      square padding are PAD_VALUE gray.
    """
    b = boxes.astype(jnp.int32).astype(jnp.float32)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    cw = x2 - x1
    ch = y2 - y1
    side = jnp.maximum(cw, ch)  # square canvas side (pad right/bottom)

    p = jnp.arange(out_size, dtype=jnp.float32)
    # align_corners=False source coordinate within the square canvas
    def per_box(x1b, y1b, cwb, chb, sideb):
        scale = sideb / out_size
        src = (p + 0.5) * scale - 0.5  # (S,)
        sx = x1b + src[None, :]  # (1, S) broadcast rows
        sy = y1b + src[:, None]  # (S, 1)
        sx2 = jnp.broadcast_to(sx, (out_size, out_size))
        sy2 = jnp.broadcast_to(sy, (out_size, out_size))
        vals = _bilinear_gather(image, sx2, sy2)
        # Inside the crop: sample the image. In the padded square region
        # (src beyond crop width/height): gray. Reference pads the square
        # canvas then resizes, so the boundary blend uses the clamped edge
        # sample vs gray; we blend explicitly at the crop edge.
        inside_x = (src[None, :] < cwb) & (src[None, :] >= -0.5)
        inside_y = (src[:, None] < chb) & (src[:, None] >= -0.5)
        inside = inside_x & inside_y
        return jnp.where(inside[..., None], vals, PAD_VALUE)

    return jax.vmap(per_box)(x1, y1, cw, ch, side)


def _tent_matrix(src_coords: Array, in_size: int) -> Array:
    """(P,) fractional source coords -> (P, in_size) bilinear weights.

    Row p holds the tent-kernel weights max(0, 1 - |src - h|): exactly the
    two-tap bilinear interpolation, expressed densely so resampling
    becomes a matmul on the MXU instead of a gather.
    """
    grid = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    src = jnp.clip(src_coords, 0.0, in_size - 1.0)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - grid))


@functools.partial(jax.jit, static_argnames=("out_size", "compute_dtype"))
def crop_resize_square_mxu(image: Array, boxes: Array,
                           out_size: int = CLASSIFICATION_IMAGE_SIZE,
                           compute_dtype=jnp.bfloat16) -> Array:
    """MXU formulation of crop_resize_square: separable bilinear
    resampling as two einsums with per-crop interpolation matrices.

    Gathers are scalar-unit work on TPU and dominate the crop stage at
    hundreds of detections/image; the dense-interp matmul runs on the
    systolic array instead. Same sampling semantics as
    crop_resize_square (integer box coords, align_corners=False, gray
    square padding), within bf16 accumulation tolerance.
    """
    h, w = image.shape[0], image.shape[1]
    b = boxes.astype(jnp.int32).astype(jnp.float32)
    x1, y1 = b[:, 0], b[:, 1]
    cw = b[:, 2] - x1
    ch = b[:, 3] - y1
    side = jnp.maximum(cw, ch)

    p = jnp.arange(out_size, dtype=jnp.float32)
    src = (p[None, :] + 0.5) * (side[:, None] / out_size) - 0.5  # (N, S)

    ry = jax.vmap(lambda s, y0: _tent_matrix(s + y0, h))(src, y1)  # (N,S,H)
    rx = jax.vmap(lambda s, x0: _tent_matrix(s + x0, w))(src, x1)  # (N,S,W)

    img = image.astype(compute_dtype)
    ry = ry.astype(compute_dtype)
    rx = rx.astype(compute_dtype)
    tmp = jnp.einsum("nsh,hwc->nswc", ry, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nswc,ntw->nstc", tmp.astype(compute_dtype), rx,
                     preferred_element_type=jnp.float32)

    inside = ((src < cw[:, None]) & (src >= -0.5))[:, None, :, None] \
        & ((src < ch[:, None]) & (src >= -0.5))[:, :, None, None]
    return jnp.where(inside, out, PAD_VALUE)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(image: Array, out_h: int, out_w: int) -> Array:
    """Plain bilinear resize (align_corners=False) of an HWC image."""
    h, w = image.shape[0], image.shape[1]
    py = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    px = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    sy = jnp.broadcast_to(py[:, None], (out_h, out_w))
    sx = jnp.broadcast_to(px[None, :], (out_h, out_w))
    return _bilinear_gather(image, sx, sy)


def pad_to_square_resize(image: Array,
                         out_size: int = CLASSIFICATION_IMAGE_SIZE) -> Array:
    """Square-pad a whole image with gray then resize — the full-image
    variant of resize_for_classification (cvpce/datautils.py:234-239)."""
    h, w = image.shape[0], image.shape[1]
    side = max(h, w)
    canvas = jnp.full((side, side, image.shape[2]), PAD_VALUE, image.dtype)
    canvas = canvas.at[:h, :w].set(image)
    return resize_bilinear(canvas, out_size, out_size)
