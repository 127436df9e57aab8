"""Im2colConv: the thin-Cin contraction twin matches nn.Conv/lax.conv.

Motivated by the r4 trunk profile: XLA pads Cin=3 contractions to the
128-lane MXU width (stem at 4.4 TFLOP/s, PERF.md). The im2col module
must be a drop-in (same params, same math) for the stem and conv1_1.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cvpce_tpu.models.layers import Im2colConv, conv


def _compare(kernel, strides, padding, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape), jnp.float32)
    ref = conv(64, kernel, strides=strides, padding=padding,
               use_bias=False, dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    mod = Im2colConv(64, kernel_size=kernel, strides=strides,
                     padding=padding, use_bias=False, dtype=jnp.float32)
    out = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.apply(v, x)),
                               rtol=1e-4, atol=1e-4)


def test_stem_7x7_s2():
    _compare(7, 2, 3, (2, 64, 96, 3))


def test_vgg_3x3_s1():
    _compare(3, 1, 1, (2, 32, 48, 3))


def test_macvgg_im2col_conv1_same_embedding():
    from cvpce_tpu.models.embedders import MACVGG

    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3)),
                    jnp.float32)
    base = MACVGG(batch_norm=False, dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x)
    twin = MACVGG(batch_norm=False, dtype=jnp.float32, im2col_conv1=True)
    np.testing.assert_allclose(np.asarray(twin.apply(v, x)),
                               np.asarray(base.apply(v, x)),
                               rtol=1e-4, atol=1e-4)


def test_resnet_stem_im2col_same_feats():
    from cvpce_tpu.models.resnet import ResNet50

    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 96, 3)),
                    jnp.float32)
    base = ResNet50(norm="frozen", dtype=jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x)
    twin = ResNet50(norm="frozen", dtype=jnp.float32, stem_im2col=True)
    ref = base.apply(v, x)
    out = twin.apply(v, x)
    for tap in ("c1", "c5"):
        np.testing.assert_allclose(np.asarray(out[tap]),
                                   np.asarray(ref[tap]),
                                   rtol=2e-4, atol=2e-4)
