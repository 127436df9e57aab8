"""Fused maxpool2x2 -> int8 3x3 conv Pallas kernel vs the XLA
composition it replaces (models/layers.py:max_pool then
models/quant.py:Int8Conv static semantics).

The int32 accumulator path is asserted EXACT; the f32 dequant epilogue
may differ by fma association (1 bf16 ulp), so the end-to-end check is
a tight allclose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cvpce_tpu.ops.conv_pallas import fused_pool_int8_conv


def _ref_pool_int8_conv(x, kq, a_scale, scale, bias):
    xp = nn.max_pool(x, (2, 2), strides=(2, 2))
    xq = jnp.clip(jnp.round(xp.astype(jnp.float32) / a_scale),
                  -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(
        xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
    return jnp.maximum(y, 0), acc


def _make(cin, cout, hw, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 3, (2, hw, hw, cin))
                    .astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(
        (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(np.float32))
    w_scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)),
                          1e-8) / 127.0
    kq = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1)
    a_scale = jnp.float32(3.0 / 127.0)
    return x, kq, a_scale, a_scale * w_scale, bias


# hw=64 exercises multiple row strips (S=2 at SH=16); hw=32 the
# single-strip path. Cin 64 exercises the tap-pair lane packing.
@pytest.mark.parametrize("cin,cout,hw", [
    (64, 128, 64), (128, 256, 32), (256, 512, 64)])
def test_fused_matches_xla_composition(cin, cout, hw):
    x, kq, a_scale, scale, bias = _make(cin, cout, hw)
    ref, acc_ref = _ref_pool_int8_conv(x, kq, a_scale, scale, bias)

    # integer accumulators exact (identity dequant exposes them; sums
    # stay below 2^24 so f32 carries them exactly)
    got_acc = fused_pool_int8_conv(
        x, kq, a_scale, jnp.ones(cout), jnp.zeros(cout),
        fuse_relu=False, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_ref, np.int64),
                                  np.asarray(got_acc).astype(np.int64))

    got = fused_pool_int8_conv(x, kq, a_scale, scale, bias,
                               fuse_relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.05)
    # fma-association-only differences: almost everything bit-equal
    eq = (np.asarray(got, np.float32) == np.asarray(ref, np.float32))
    assert eq.mean() > 0.999


def test_relu_and_dtype_flags():
    x, kq, a_scale, scale, bias = _make(64, 128, 32, seed=1)
    y = fused_pool_int8_conv(x, kq, a_scale, scale, bias,
                             fuse_relu=False, out_dtype=jnp.float32,
                             interpret=True)
    assert y.dtype == jnp.float32
    assert (np.asarray(y) < 0).any()  # no relu applied
    yr = fused_pool_int8_conv(x, kq, a_scale, scale, bias,
                              fuse_relu=True, interpret=True)
    assert yr.dtype == jnp.bfloat16
    assert (np.asarray(yr, np.float32) >= 0).all()
