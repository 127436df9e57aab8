"""Fused maxpool2x2 -> int8 3x3 conv Pallas kernel (VGG block boundary).

The static-int8 MACVGG serving stack is HBM-bound at the pool->conv
block boundaries: XLA materializes the pre-pool activation, the pool
reads it back and writes the pooled tensor, and the conv reads that
again (PERF.md r2 layer profile: pool1+conv2_1 measured 17.95 ms per
512 crops vs ~5.5 ms int8 compute speed-of-light). This kernel streams
the pre-pool activation through VMEM once: pool + quantize + im2col +
int8 MXU matmul + f32 dequant epilogue, with the pooled intermediate
never touching HBM.

Semantics are bit-matched to models/quant.py:Int8Conv(static_scale)
applied after models/layers.py:max_pool(2, 2): same per-tensor
activation quantization (round-half-even, clip +-127), int32
accumulation, per-output-channel dequant, f32 bias add, optional fused
ReLU (the plan entry that follows the conv when BN is folded).

STATUS — correctness-verified EXPERIMENT, not wired into serving.
Measured on v5e (scripts/profile_fused_pool.py): SLOWER than the XLA
composition at every site (102 vs 56 ms/512 at the 256^2 site, 32 vs
26 at 128^2, parity at 64^2). Stage-split probes show the MXU dot is
~5 ms; the pool+staging+im2col machinery costs 45-98 ms — Mosaic
lowers the 64-lane-channel staging stores and strided pooling picks
far from speed-of-light, and "cheaper" variants (lane-packed
(W/2, 2C) pool, per-tap dot accumulation without a patch scratch)
scalarize outright (~12 s/call). With the in-network XLA marginal
cost of the worst site (17.95 ms/512) already within ~2x of its
~8.5 ms HBM bandwidth floor, the best possible win is ~8-12 ms of an
86 ms embed — abandoned in favor of that analysis. See PERF.md
"Negative result: fused pool->conv Pallas kernel".

Kernel structure: grid (B, S+1) over crops x SH-row output strips.
Step s pools input rows [2*s*SH, 2*(s+1)*SH) into a persistent padded
VMEM scratch (zero borders = the conv's zero padding), and convolves
strip s-1 — by then its +1-row halo is resident. The extra final step
convolves the last strip. Taps are packed into 128-multiple lane
groups so the single dot per strip runs the MXU at full lane width
even for Cin=64 (pairs of taps per group; reference conv shapes:
cvpce/models/classification.py:20-40, torchvision VGG16 features).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _pack_kernel(kq: Array) -> Array:
    """(3, 3, Cin, Cout) int8 -> (KPACK, Cout) with taps on 128-multiple
    lane groups of the contraction dim (pairs of taps when Cin == 64)."""
    _, _, cin, cout = kq.shape
    taps = kq.reshape(9, cin, cout)
    if cin >= 128:
        return taps.reshape(9 * cin, cout)
    if cin == 64:
        taps = jnp.concatenate(
            [taps, jnp.zeros((1, cin, cout), kq.dtype)], axis=0)
        # (10, 64, C) -> 5 groups of 128
        return taps.reshape(5, 2 * cin, cout).reshape(10 * cin, cout)
    raise ValueError(f"unsupported Cin {cin}")


def _kpack(cin: int) -> int:
    return 9 * cin if cin >= 128 else 10 * cin


def _kernel(a_ref, in_ref, kq_ref, scale_ref, bias_ref, out_ref,
            pooled_ref, patches_ref, *, sh: int, s_total: int, q: int,
            cin: int, cout: int, fuse_relu: bool, out_dtype):
    b = pl.program_id(0)
    s = pl.program_id(1)
    p_rows = s_total * sh

    @pl.when((b == 0) & (s == 0))
    def _():
        # Zero the conv's padding border once; the interior is fully
        # rewritten per crop and the border is never written again.
        pooled_ref[0, :, :] = jnp.zeros((q + 2, cin), jnp.int8)
        pooled_ref[p_rows + 1, :, :] = jnp.zeros((q + 2, cin), jnp.int8)
        pooled_ref[:, 0, :] = jnp.zeros((p_rows + 2, cin), jnp.int8)
        pooled_ref[:, q + 1, :] = jnp.zeros((p_rows + 2, cin), jnp.int8)

    @pl.when(s < s_total)
    def _():
        # Pool 2*SH input rows to SH pooled rows, quantize, stage.
        # Stride-2 picks must be reshape-split + static index (strided
        # sublane slices lower to unsupported gathers in Mosaic).
        v = in_ref[0]                      # (2*SH, W, Cin)
        w = v.shape[1]
        r = v.reshape(sh, 2, w, cin)
        rows = jnp.maximum(r[:, 0], r[:, 1])
        c = rows.reshape(sh, w // 2, 2, cin)
        pooled = jnp.maximum(c[:, :, 0, :], c[:, :, 1, :])
        a_scale = a_ref[0, 0]
        pq = jnp.clip(jnp.round(pooled.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
        pooled_ref[pl.ds(1 + s * sh, sh), 1:q + 1, :] = pq

    @pl.when(s >= 1)
    def _():
        t = s - 1
        wp = pooled_ref[pl.ds(t * sh, sh + 2), :, :]  # (SH+2, Q+2, Cin)
        if cin >= 128:
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                view = wp[dy:dy + sh, dx:dx + q, :].reshape(sh * q, cin)
                patches_ref[:, tap * cin:(tap + 1) * cin] = view
        else:  # Cin 64: pack tap pairs onto full 128-lane groups.
            # Two 64-lane stores per pair (a lane-concat of the two
            # views trips a Mosaic layout-offset check).
            zeros = jnp.zeros((sh, q, cin), jnp.int8)
            for tap in range(10):
                pair, half = divmod(tap, 2)
                view = (wp[tap // 3:tap // 3 + sh,
                           tap % 3:tap % 3 + q, :]
                        if tap < 9 else zeros)
                off = pair * 2 * cin + half * cin
                patches_ref[:, off:off + cin] = view.reshape(sh * q, cin)
        acc = jax.lax.dot_general(
            patches_ref[...], kq_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale_ref[0, :] + bias_ref[0, :]
        y = y.astype(out_dtype)
        if fuse_relu:
            y = jnp.maximum(y, jnp.zeros((), out_dtype))
        out_ref[0, :, :, :] = y.reshape(sh, q, cout)


@functools.partial(jax.jit,
                   static_argnames=("fuse_relu", "out_dtype", "interpret"))
def fused_pool_int8_conv(x: Array, kq: Array, a_scale: Array,
                         scale: Array, bias: Array,
                         fuse_relu: bool = False,
                         out_dtype=jnp.bfloat16,
                         interpret: Optional[bool] = None) -> Array:
    """maxpool2x2(stride 2) then 3x3 same-pad int8 conv, fused.

    x: (B, H, W, Cin) activations (bf16/f32), H and W even.
    kq: (3, 3, Cin, Cout) int8 quantized kernel.
    a_scale: () f32 static activation scale (of the POOLED input, as
        calibrated by the unfused Int8Conv(fuse_pool=True) twin).
    scale: (Cout,) f32 dequant scale (a_scale * per-channel w_scale).
    bias: (Cout,) f32.
    Returns (B, H/2, W/2, Cout) in out_dtype, ReLU'd if fuse_relu.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b_dim, h, w, cin = x.shape
    cout = kq.shape[-1]
    p, q = h // 2, w // 2
    sh = 16 if p % 16 == 0 else (8 if p % 8 == 0 else p)
    s_total = p // sh
    kqp = _pack_kernel(kq)

    kernel = functools.partial(
        _kernel, sh=sh, s_total=s_total, q=q, cin=cin, cout=cout,
        fuse_relu=fuse_relu, out_dtype=out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(b_dim, s_total + 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * sh, w, cin),
                         lambda b, s: (b, jnp.minimum(s, s_total - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kqp.shape[0], cout), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sh, q, cout),
            lambda b, s: (b, jnp.maximum(s - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_dim, p, q, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((p + 2, q + 2, cin), jnp.int8),
            pltpu.VMEM((sh * q, kqp.shape[0]), jnp.int8),
        ],
        # The 256^2 site's blocks + scratch + vector temporaries top the
        # default 16M scoped-vmem budget slightly; v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(a_scale.astype(jnp.float32), (1, 1)), x, kqp,
      scale.astype(jnp.float32).reshape(1, cout),
      bias.astype(jnp.float32).reshape(1, cout))
