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


def test_classifier_int8_static_calibration_roundtrip(tmp_path):
    """Production flow: the Classifier calibrates an int8_static encoder
    on the gallery, persists scales with the saved index, and a fresh
    encoder restored from that index serves identical numerics."""
    from cvpce_tpu.models.embedders import EmbedFn
    from cvpce_tpu.pipeline.classifier import Classifier

    model = MACVGG(batch_norm=True, dtype=jnp.bfloat16, int8_all=True,
                   int8_static=True)
    base = MACVGG(batch_norm=True)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    enc = EmbedFn(model, variables)
    assert enc.needs_calibration

    class Gallery:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            img = r.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
            return img, img, ["c"], f"prod{i}"

    c = Classifier(enc, model.embedding_size, sample_set=Gallery(),
                   batch_size=4, k=1)
    scales = enc.get_scales()
    assert scales is not None and len(jax.tree.leaves(scales)) == 12

    path = str(tmp_path / "index.npz")
    c.save_index(path)
    enc2 = EmbedFn(model, variables)
    c2 = Classifier(enc2, model.embedding_size, load=path, batch_size=4,
                    k=1)
    assert enc2.get_scales() == scales
    q = np.stack([Gallery()[2][0]])
    assert c2.classify(q)[0][0] == "prod2"


def test_int8_static_scales_calibrate_and_match_dynamic():
    """Static-scale serving: calibration records per-layer running-max
    scales; an int8_static twin applied with them matches the dynamic
    path when the calibration data covers the eval data's range."""
    from cvpce_tpu.models.embedders import calibrate_int8_scales

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    base = MACVGG(batch_norm=True)
    variables = base.init(jax.random.PRNGKey(0), x)

    cal = MACVGG(batch_norm=True, int8_all=True, int8_calibrate=True)
    # calibrate on x alone so the recorded scales cover exactly the
    # dynamic abs-max for x. Even then static != dynamic bit-for-bit:
    # the two programs compile the abs-max reduction with different
    # orderings, ulp-level scale shifts flip round() at .5 boundaries,
    # and the flips cascade through 12 quantized layers (measured
    # ~7e-4 max on the unit-norm embedding, cos 0.99998).
    v_cal = calibrate_int8_scales(cal, variables, [x])
    assert "act_scales" in v_cal
    scales = jax.tree.leaves(v_cal["act_scales"])
    assert len(scales) == 12  # all convs but conv1_1
    assert all(float(s) > 0 for s in scales)
    e_static = np.asarray(
        MACVGG(batch_norm=True, int8_all=True, int8_static=True)
        .apply(v_cal, x))
    e_dyn = np.asarray(
        MACVGG(batch_norm=True, int8_all=True).apply(variables, x))
    cos = (e_static * e_dyn).sum(-1) / (
        np.linalg.norm(e_static, axis=-1) * np.linalg.norm(e_dyn, axis=-1))
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(e_static, e_dyn, atol=5e-3)

    # and the all-int8 path still retrieves against the f32 reference
    e = np.asarray(base.apply(variables, x))
    sims = e_static @ e.T
    assert (np.argmax(sims, axis=1) == np.arange(len(x))).all()


def test_macresnet_int8_static_roundtrip():
    """MACResNet quant='static': calibrate-then-serve matches the f32
    trunk closely (cos) and EmbedFn drives the lifecycle."""
    from cvpce_tpu.models.embedders import EmbedFn, MACResNet

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    base = MACResNet(train=False)
    variables = base.init(jax.random.PRNGKey(0), x)

    enc = EmbedFn(MACResNet(train=False, dtype=jnp.bfloat16,
                            quant="static"), variables)
    assert enc.needs_calibration
    e8 = np.asarray(enc(x))  # self-calibrates on first batch
    assert enc.get_scales() is not None
    # 52 quantized convs: 16 bottlenecks x 3 + 4 downsample (stem excluded)
    assert len(jax.tree.leaves(enc.get_scales())) == 52

    ref = np.asarray(base.apply(variables, x))
    cos = (e8 * ref).sum(-1)
    assert (cos > 0.98).all(), cos
