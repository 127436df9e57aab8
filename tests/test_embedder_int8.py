"""Int8 MACVGG serving path: checkpoint compatibility + fidelity."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpce_tpu.models.embedders import INT8_FAVORED_CONVS, MACVGG


def test_int8_macvgg_same_params_high_cosine():
    """int8=True applies the SAME variables (quantization is at apply
    time) and embeddings stay close to the f32 model's."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    m = MACVGG(batch_norm=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    m8 = MACVGG(batch_norm=True, int8=True)

    e = np.asarray(m.apply(variables, x))
    e8 = np.asarray(m8.apply(variables, x))
    assert e8.shape == e.shape
    # both are L2-normalized; cosine similarity per row
    cos = (e * e8).sum(-1)
    assert np.all(cos > 0.98), cos
    # retrieval self-agreement: each int8 embedding's NN among the f32
    # embeddings is itself
    sims = e8 @ e.T
    assert (np.argmax(sims, axis=1) == np.arange(len(x))).all()


def test_int8_conv_ordinals_cover_vgg16():
    assert INT8_FAVORED_CONVS <= set(range(1, 14))
    # the bf16-favored layers measured on v5e stay bf16
    assert {1, 3, 8}.isdisjoint(INT8_FAVORED_CONVS)
