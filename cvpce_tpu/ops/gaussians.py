"""Gaussian heatmap target rendering, fully on-device.

The reference builds GLN's Gaussian targets on the host with a Python loop
over boxes, rendering each box into a window of an image-sized heatmap
(cvpce/datautils.py:16-85: three generators — multivariate-normal, the
fixed-kernel "Kant method", and "simple & scaled" — and three join methods —
add / replace / max). Here the same semantics are a fixed-shape jitted
computation: every box is evaluated against the full output grid with a
window mask, and boxes are folded in with a `lax.scan` (which preserves the
order-dependence of the `replace` join; `add`/`max` are order-independent).

Coordinate conventions match the reference exactly: box coords are
floor-divided by `size_reduction`, the render window for a box is
[max(x1,0), min(x2,W)) x [max(y1,0), min(y2,H)) on the integer grid, and the
background is -1 for tanh targets, 0 otherwise.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jnp.ndarray

KANT_SIZE = 120
KANT_SIGMA = 40.0
_BOX_CHUNK = 32  # boxes rendered per scan step for associative joins


def _kant_kernel(size: int = KANT_SIZE, sigma: float = KANT_SIGMA) -> Array:
    """The fixed 120x120 kernel of the Kant method (cvpce/datautils.py:39-51):
    exp(-4 ln 2 * ((x-cx)^2 + (y-cy)^2) / sigma^2)."""
    c = size // 2
    coords = jnp.arange(size, dtype=jnp.float32)
    xx = (coords - c) ** 2
    grid = xx[:, None] + xx[None, :]
    return jnp.exp(-4.0 * math.log(2.0) * grid / sigma**2)


def _bilinear_resize_sample(kernel: Array, u: Array, v: Array,
                            out_w: Array, out_h: Array) -> Array:
    """Sample `kernel` (K, K) as if bilinearly resized (align_corners=False)
    to (out_w, out_h), evaluated at integer output coords (u, v).

    Matches torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False): src = max(0, (dst + 0.5) * in/out - 0.5), floor to
    x0, x1 = min(x0 + 1, in - 1).
    """
    k = kernel.shape[0]
    su = jnp.maximum((u + 0.5) * (k / jnp.maximum(out_w, 1.0)) - 0.5, 0.0)
    sv = jnp.maximum((v + 0.5) * (k / jnp.maximum(out_h, 1.0)) - 0.5, 0.0)
    u0 = jnp.clip(jnp.floor(su).astype(jnp.int32), 0, k - 1)
    v0 = jnp.clip(jnp.floor(sv).astype(jnp.int32), 0, k - 1)
    u1 = jnp.minimum(u0 + 1, k - 1)
    v1 = jnp.minimum(v0 + 1, k - 1)
    lu = su - u0
    lv = sv - v0
    k00 = kernel[u0, v0]
    k01 = kernel[u0, v1]
    k10 = kernel[u1, v0]
    k11 = kernel[u1, v1]
    return ((1 - lu) * (1 - lv) * k00 + (1 - lu) * lv * k01
            + lu * (1 - lv) * k10 + lu * lv * k11)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "method", "join", "tanh",
                     "size_reduction"),
)
def render_gaussians(boxes: Array, valid: Array, *, height: int, width: int,
                     method: str = "mvn", join: str = "max",
                     tanh: bool = False, size_reduction: int = 1,
                     peak: float = 1.0) -> Array:
    """Render per-box 2D Gaussians into an (H//r, W//r) heatmap.

    Args:
      boxes: (B, 4) xyxy boxes at the original image resolution (float or
        int); padded entries allowed.
      valid: (B,) bool mask of real boxes.
      method: 'mvn' | 'kant' | 'simple' (cvpce/datautils.py:27-63).
      join: 'max' | 'add' | 'replace' (cvpce/datautils.py:18-25).
      tanh: background/offset mode for the 'simple' method and the canvas
        fill (-1 instead of 0), cvpce/datautils.py:56-68.
    """
    h = height // size_reduction
    w = width // size_reduction
    fill = -1.0 if tanh else 0.0
    canvas = jnp.full((h, w), fill, dtype=jnp.float32)

    b = jnp.floor_divide(boxes.astype(jnp.float32), float(size_reduction))
    b = jnp.floor(b)  # match integer // on int boxes

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]  # (h, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, w)

    kernel = _kant_kernel() if method == "kant" else None

    def render_one(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        cx = (x1 + x2) * 0.5
        cy = (y1 + y2) * 0.5
        bw = jnp.abs(x2 - x1)
        bh = jnp.abs(y2 - y1)
        x_lo = jnp.maximum(x1, 0.0)
        x_hi = jnp.minimum(x2, float(w))
        y_lo = jnp.maximum(y1, 0.0)
        y_hi = jnp.minimum(y2, float(h))
        mask = (xs >= x_lo) & (xs < x_hi) & (ys >= y_lo) & (ys < y_hi)

        if method == "mvn":
            var_w = jnp.maximum((bw / 2.0) ** 2, 1e-12)
            var_h = jnp.maximum((bh / 2.0) ** 2, 1e-12)
            logp = -0.5 * ((ys - cy) ** 2 / var_h + (xs - cx) ** 2 / var_w)
            # Normalized by the max over the window (cvpce/datautils.py:35),
            # so the normal's constant cancels; use masked max of logp for
            # numerical stability.
            max_logp = jnp.max(jnp.where(mask, logp, -jnp.inf))
            max_logp = jnp.where(jnp.isfinite(max_logp), max_logp, 0.0)
            probs = jnp.exp(logp - max_logp) * peak
        elif method == "kant":
            probs = _bilinear_resize_sample(
                kernel, xs - x_lo, ys - y_lo, x_hi - x_lo, y_hi - y_lo
            )
        elif method == "simple":
            lo, hi = (-1.0, 1.0) if tanh else (0.0, 1.0)
            sig_w = jnp.maximum(bw / 6.0, 1e-12)
            sig_h = jnp.maximum(bh / 6.0, 1e-12)
            e = ((xs - cx) ** 2 / (2 * sig_w**2)
                 + (ys - cy) ** 2 / (2 * sig_h**2))
            probs = (hi - lo) * jnp.exp(-e) + lo
        else:
            raise ValueError(f"unknown method {method!r}")
        return probs, mask

    def step(img, box_and_valid):
        box, is_valid = box_and_valid
        probs, mask = render_one(box)
        mask = mask & is_valid
        if join == "max":
            out = jnp.where(mask, jnp.maximum(img, probs), img)
        elif join == "add":
            out = img + jnp.where(mask, probs, 0.0)
        elif join == "replace":
            out = jnp.where(mask, probs, img)
        else:
            raise ValueError(f"unknown join {join!r}")
        return out, None

    if join in ("max", "add") and b.shape[0] >= 2 * _BOX_CHUNK:
        # associative joins: evaluate _BOX_CHUNK boxes per scan step
        # (vmapped) and reduce within the chunk — cuts sequential scan
        # length ~64x for SKU-110K-sized box counts
        nb = b.shape[0]
        pad = (-nb) % _BOX_CHUNK
        b_p = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)], 0)
        v_p = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)
        b_c = b_p.reshape(-1, _BOX_CHUNK, 4)
        v_c = v_p.reshape(-1, _BOX_CHUNK)

        def chunk_step(img, chunk):
            boxes_c, valid_c = chunk
            probs, masks = jax.vmap(render_one)(boxes_c)
            masks = masks & valid_c[:, None, None]
            if join == "max":
                contrib = jnp.max(
                    jnp.where(masks, probs, -jnp.inf), axis=0)
                out = jnp.where(jnp.isfinite(contrib),
                                jnp.maximum(img, contrib), img)
            else:  # add
                out = img + jnp.where(masks, probs, 0.0).sum(axis=0)
            return out, None

        out, _ = jax.lax.scan(chunk_step, canvas, (b_c, v_c))
        return out

    out, _ = jax.lax.scan(step, canvas, (b, valid))
    return out


def render_gaussians_batch(boxes: Array, valid: Array, **kwargs) -> Array:
    """vmap over a batch: boxes (N, B, 4), valid (N, B) -> (N, h, w)."""
    fn = functools.partial(render_gaussians, **kwargs)
    return jax.vmap(lambda b, v: fn(b, v))(boxes, valid)
