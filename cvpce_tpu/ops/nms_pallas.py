"""Pallas TPU kernel for hard NMS (bitmask algorithm).

The XLA fallback (ops/nms.py) runs the greedy suppression as an N-step
`fori_loop` over (N,)-wide vector ops; on TPU every iteration pays loop
overhead, which dominates at N ~ 2000 candidates. This kernel uses the
classic bitmask formulation (as torchvision's CUDA nms does): a parallel
stage packs `i suppresses j` bits into uint32 words (N x N/32), then the
inherently-serial greedy pass runs *inside* the kernel over the packed
words — one (N/32,)-wide VPU op per candidate instead of one XLA loop
iteration.

Inputs must be pre-sorted by descending score (the wrapper handles
sorting + padding). Returns a keep mask in sorted order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

ROW_BLOCK = 256
LANES = 32  # bits per word


def _nms_kernel(boxes_ref, thresh_ref, keep_ref, mask_ref, supp_ref):
    n = boxes_ref.shape[0]
    w = n // LANES

    x1 = boxes_ref[:, 0]
    y1 = boxes_ref[:, 1]
    x2 = boxes_ref[:, 2]
    y2 = boxes_ref[:, 3]
    area = (x2 - x1) * (y2 - y1)
    thresh = thresh_ref[0]

    num_blocks = n // ROW_BLOCK
    pow2 = (jnp.uint32(1) << jax.lax.broadcasted_iota(
        jnp.uint32, (1, 1, LANES), 2))
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, n), 1)

    def stage_a(b, _):
        r0 = b * ROW_BLOCK
        sl = lambda v: jax.lax.dynamic_slice_in_dim(v, r0, ROW_BLOCK)
        rx1 = sl(x1)[:, None]
        ry1 = sl(y1)[:, None]
        rx2 = sl(x2)[:, None]
        ry2 = sl(y2)[:, None]
        rarea = sl(area)[:, None]

        ix1 = jnp.maximum(rx1, x1[None, :])
        iy1 = jnp.maximum(ry1, y1[None, :])
        ix2 = jnp.minimum(rx2, x2[None, :])
        iy2 = jnp.minimum(ry2, y2[None, :])
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = rarea + area[None, :] - inter
        iou = inter / jnp.maximum(union, 1e-12)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (ROW_BLOCK, n), 0) + r0
        bits = (iou > thresh) & (col_ids > row_ids)
        packed = jnp.sum(
            bits.reshape(ROW_BLOCK, w, LANES).astype(jnp.uint32) * pow2,
            axis=2, dtype=jnp.uint32)
        mask_ref[pl.ds(r0, ROW_BLOCK), :] = packed
        return 0

    jax.lax.fori_loop(0, num_blocks, stage_a, 0)

    # serial greedy pass over packed suppression rows
    supp_ref[0, :] = jnp.zeros((w,), jnp.uint32)

    def stage_b(i, _):
        word = supp_ref[0, i // LANES]
        bit = (word >> (i % LANES).astype(jnp.uint32)) & jnp.uint32(1)
        alive = bit == 0
        keep_ref[i] = alive.astype(jnp.int32)

        @pl.when(alive)
        def _():
            supp_ref[0, :] = supp_ref[0, :] | mask_ref[i, :]

        return 0

    jax.lax.fori_loop(0, n, stage_b, 0)


def nms_keep_sorted(boxes_sorted: Array, iou_threshold: float,
                    interpret: bool = False) -> Array:
    """Keep mask for score-desc-sorted (N, 4) boxes; N must be a multiple
    of ROW_BLOCK (pad with far-away dummies)."""
    n = boxes_sorted.shape[0]
    assert n % ROW_BLOCK == 0, n
    w = n // LANES
    thresh = jnp.asarray([iou_threshold], jnp.float32)
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, w), jnp.uint32),
            pltpu.VMEM((1, w), jnp.uint32),
        ],
        interpret=interpret,
    )(boxes_sorted, thresh)
    return keep.astype(bool)


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "interpret"))
def nms_mask_pallas(boxes: Array, scores: Array, valid: Array,
                    iou_threshold: float = 0.5,
                    interpret: bool = False) -> Array:
    """Drop-in replacement for ops.nms.nms_mask using the Pallas kernel.

    Pads to a ROW_BLOCK multiple, sorts by score, runs the kernel, and
    scatters the keep mask back to input order.
    """
    n = boxes.shape[0]
    pad = (-n) % ROW_BLOCK
    if pad:
        far = jnp.full((pad, 4), -1e6, boxes.dtype).at[:, 2:].add(1.0)
        boxes = jnp.concatenate([boxes, far], 0)
        scores = jnp.concatenate(
            [scores, jnp.full((pad,), -jnp.inf, scores.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked_scores)
    keep_sorted = nms_keep_sorted(boxes[order], iou_threshold,
                                  interpret=interpret)
    keep_sorted = keep_sorted & valid[order]
    keep = jnp.zeros(boxes.shape[0], bool).at[order].set(keep_sorted)
    return keep[:n]
