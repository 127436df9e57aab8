"""MXU crop+resize vs the gather implementation."""
import numpy as np

from cvpce_tpu.ops.image import crop_resize_square, crop_resize_square_mxu


def test_mxu_crops_match_gather():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(120, 160, 3)).astype(np.float32)
    boxes = np.array([
        [10, 20, 60, 90],     # tall crop (pad right)
        [5, 5, 105, 55],      # wide crop (pad bottom)
        [0, 0, 40, 40],       # square
        [100, 80, 158, 118],  # near edge
    ], np.float32)
    want = np.asarray(crop_resize_square(img, boxes, out_size=64))
    got = np.asarray(crop_resize_square_mxu(img, boxes, out_size=64,
                                            compute_dtype=np.float32))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mxu_crops_bf16_tolerance():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    boxes = np.array([[8, 8, 72, 72]], np.float32)
    want = np.asarray(crop_resize_square(img, boxes, out_size=32))
    got = np.asarray(crop_resize_square_mxu(img, boxes, out_size=32,
                                            compute_dtype=jnp.bfloat16))
    assert np.abs(got - want).mean() < 0.01
