"""Pallas TPU kernel for hard NMS.

The XLA fallback (ops/nms.py) runs the greedy suppression as an N-step
`fori_loop` over (N,)-wide vector updates; on TPU every iteration pays
XLA while-loop overhead, which dominates at N ~ 2000 candidates. Here the
whole serial pass runs inside one kernel: per candidate, its IoU row is
computed on the fly against all boxes (a handful of (1, N) VPU ops) and
OR-ed into a (1, N) suppression vector. No N x N materialization, no
bitset packing (mosaic's layout inference rejects lane-splitting
reshapes), ~15 vector ops per candidate.

Layout note: boxes enter TRANSPOSED as an (8, N) f32 block (rows x1, y1,
x2, y2, pad...) so coordinate vectors live on the lane dimension without
any sublane->lane shape cast. Inputs must be pre-sorted by descending
score (the wrapper sorts + pads). Returns the keep mask in sorted order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

ALIGN = 256


def _nms_kernel(boxes_t_ref, thresh_ref, keep_ref, supp_ref):
    n = boxes_t_ref.shape[1]
    x1 = boxes_t_ref[0:1, :]
    y1 = boxes_t_ref[1:2, :]
    x2 = boxes_t_ref[2:3, :]
    y2 = boxes_t_ref[3:4, :]
    area = (x2 - x1) * (y2 - y1)
    thresh = thresh_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    supp_ref[0:1, :] = jnp.zeros((1, n), jnp.int32)
    neg = jnp.float32(-3.0e38)

    def body(i, _):
        supp = supp_ref[0:1, :]
        sel = col == i
        alive = jnp.max(jnp.where(sel, supp, 0)) == 0

        @pl.when(alive)
        def _():
            # extract candidate i's box via masked max (no scalar gather)
            rx1 = jnp.max(jnp.where(sel, x1, neg))
            ry1 = jnp.max(jnp.where(sel, y1, neg))
            rx2 = jnp.max(jnp.where(sel, x2, neg))
            ry2 = jnp.max(jnp.where(sel, y2, neg))
            rarea = (rx2 - rx1) * (ry2 - ry1)

            ix1 = jnp.maximum(rx1, x1)
            iy1 = jnp.maximum(ry1, y1)
            ix2 = jnp.minimum(rx2, x2)
            iy2 = jnp.minimum(ry2, y2)
            inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
            union = rarea + area - inter
            iou = inter / jnp.maximum(union, 1e-12)
            mark = ((iou > thresh) & (col > i)).astype(jnp.int32)
            supp_ref[0:1, :] = supp | mark

        return 0

    jax.lax.fori_loop(0, n, body, 0)
    keep_ref[0:1, :] = 1 - supp_ref[0:1, :]


def nms_keep_sorted(boxes_sorted: Array, iou_threshold: float,
                    interpret: bool = False) -> Array:
    """Keep mask for score-desc-sorted (N, 4) boxes; N must be a multiple
    of ALIGN (pad with far-away dummies)."""
    n = boxes_sorted.shape[0]
    assert n % ALIGN == 0, n
    boxes_t = jnp.zeros((8, n), boxes_sorted.dtype).at[:4, :].set(
        boxes_sorted.T)
    thresh = jnp.asarray([iou_threshold], jnp.float32)
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(boxes_t, thresh)
    return keep[0].astype(bool)


def _soft_nms_kernel(boxes_t_ref, scores_ref, params_ref, out_ref,
                     cur_ref, proc_ref, *, method):
    n = boxes_t_ref.shape[1]
    x1 = boxes_t_ref[0:1, :]
    y1 = boxes_t_ref[1:2, :]
    x2 = boxes_t_ref[2:3, :]
    y2 = boxes_t_ref[3:4, :]
    area = (x2 - x1) * (y2 - y1)
    sigma = params_ref[0]
    thresh = params_ref[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    cur_ref[0:1, :] = scores_ref[0:1, :]
    # processed starts true for padded/invalid entries (score == -inf)
    proc_ref[0:1, :] = (scores_ref[0:1, :] < -1.0e37).astype(jnp.int32)
    neg = jnp.float32(-3.0e38)

    def body(_, carry):
        cur = cur_ref[0:1, :]
        proc = proc_ref[0:1, :]
        cand = jnp.where(proc == 0, cur, neg)
        m = jnp.max(cand)

        @pl.when(m > -1.0e37)
        def _():
            sel = (cand == m) & (col == jnp.min(
                jnp.where(cand == m, col, jnp.int32(2**30))))
            rx1 = jnp.max(jnp.where(sel, x1, neg))
            ry1 = jnp.max(jnp.where(sel, y1, neg))
            rx2 = jnp.max(jnp.where(sel, x2, neg))
            ry2 = jnp.max(jnp.where(sel, y2, neg))
            rarea = (rx2 - rx1) * (ry2 - ry1)
            ix1 = jnp.maximum(rx1, x1)
            iy1 = jnp.maximum(ry1, y1)
            ix2 = jnp.minimum(rx2, x2)
            iy2 = jnp.minimum(ry2, y2)
            inter = jnp.maximum(ix2 - ix1, 0.0) \
                * jnp.maximum(iy2 - iy1, 0.0)
            iou = inter / jnp.maximum(rarea + area - inter, 1e-12)
            if method == "gaussian":
                decay = jnp.exp(-(iou * iou) / sigma)
            else:
                decay = jnp.where(iou > thresh, 1.0 - iou, 1.0)
            decay = jnp.where((proc == 1) | sel, 1.0, decay)
            cur_ref[0:1, :] = cur * decay
            proc_ref[0:1, :] = proc | sel.astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[0:1, :] = cur_ref[0:1, :]


@functools.partial(jax.jit, static_argnames=("method", "interpret"))
def soft_nms_scores_pallas(boxes: Array, scores: Array, valid: Array,
                           sigma: float = 0.5, iou_threshold: float = 0.5,
                           method: str = "gaussian",
                           interpret: bool = False) -> Array:
    """Pallas Soft-NMS re-scoring: drop-in for ops.nms.soft_nms_scores
    (same sequential decay semantics, run inside one kernel)."""
    n = boxes.shape[0]
    pad = (-n) % ALIGN
    if pad:
        far = jnp.full((pad, 4), -1e6, boxes.dtype).at[:, 2:].add(1.0)
        boxes = jnp.concatenate([boxes, far], 0)
        scores = jnp.concatenate(
            [scores, jnp.zeros((pad,), scores.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)
    np_ = boxes.shape[0]
    boxes_t = jnp.zeros((8, np_), boxes.dtype).at[:4, :].set(boxes.T)
    masked = jnp.where(valid, scores, -jnp.inf)[None, :]
    params = jnp.asarray([sigma, iou_threshold], jnp.float32)
    out = pl.pallas_call(
        functools.partial(_soft_nms_kernel, method=method),
        out_shape=jax.ShapeDtypeStruct((1, np_), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, np_), jnp.float32),
            pltpu.VMEM((1, np_), jnp.int32),
        ],
        interpret=interpret,
    )(boxes_t, masked.astype(jnp.float32), params)
    return jnp.where(valid[:n], out[0, :n], 0.0)


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "interpret"))
def nms_mask_pallas(boxes: Array, scores: Array, valid: Array,
                    iou_threshold: float = 0.5,
                    interpret: bool = False) -> Array:
    """Drop-in replacement for ops.nms.nms_mask using the Pallas kernel.

    Pads to an ALIGN multiple, sorts by score, runs the kernel, and
    scatters the keep mask back to input order.
    """
    n = boxes.shape[0]
    pad = (-n) % ALIGN
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
