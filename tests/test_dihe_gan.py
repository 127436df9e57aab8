"""DIHE / GAN tests: model shapes, hierarchy similarity, three-player
train-step smoke on tiny images."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpce_tpu.models.gan import AveragingPatchGAN, PatchGAN, UNetGenerator
from cvpce_tpu.train.dihe import (
    DIHETrainConfig,
    GANPretrainConfig,
    hierarchy_similarity,
    init_dihe_state,
    make_dihe_train_step,
    make_gan_pretrain_step,
)


class TestGANModels:
    def test_generator_shape_and_range(self):
        gen = UNetGenerator(num_downs=4)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        variables = gen.init(jax.random.PRNGKey(0), x)
        out = gen.apply(variables, x, mutable=["batch_stats"])[0]
        assert out.shape == (2, 64, 64, 3)
        assert float(jnp.abs(out).max()) <= 1.0  # tanh output

    def test_generator_masked_input(self):
        gen = UNetGenerator(num_downs=4)
        x = jnp.zeros((1, 64, 64, 4), jnp.float32)  # RGB + mask channel
        variables = gen.init(jax.random.PRNGKey(0), x)
        out = gen.apply(variables, x, mutable=["batch_stats"])[0]
        assert out.shape == (1, 64, 64, 3)

    def test_patchgan_is_patchwise(self):
        d = PatchGAN()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(variables, x, mutable=["batch_stats"])[0]
        # 64 -> 32 -> 16 -> 8 (stride-2 x3), then two stride-1 convs
        assert out.shape[0] == 1 and out.shape[-1] == 1
        assert out.shape[1] > 1 and out.shape[2] > 1  # patch logits

    def test_averaging_patchgan_scalar_probability(self):
        d = AveragingPatchGAN()
        x = jnp.zeros((3, 64, 64, 3), jnp.float32)
        variables = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(variables, x, mutable=["batch_stats"])[0]
        assert out.shape == (3,)
        assert ((np.asarray(out) >= 0) & (np.asarray(out) <= 1)).all()


class TestHierarchySimilarity:
    def test_reference_golden_cases(self):
        # golden fixture pinning cvpce/classification_training.py:181-194
        # (values from the reference's classification_training_test.py):
        # - identical paths -> 1
        # - divergence at depth j -> j / len(positive)
        # - positive is a prefix of the negative -> 1 (Tonioni Eq 2)
        # - negative shorter than positive -> truncation depth fraction
        pos = [
            ["Quick", "Brown", "Fox", "Lazy", "Dog"],
            ["Quick", "Brown", "Fox", "Lazy", "Dog"],
            ["Quick", "Brown", "Fox"],
            ["Pot", "Kettle", "Black"],
            ["Pot", "Kettle", "Black"],
            ["Pot", "Kettle", "Black"],
        ]
        neg = [
            ["Quick", "Brown", "Fox", "Lazy", "Dog"],
            ["Quick", "Brown", "Cat", "Lazy", "Dog"],
            ["Quick", "Brown", "Fox", "Snoozy", "Hyena"],
            ["Quick", "Brown", "Fox", "Lazy", "Dog"],
            ["Pot"],
            ["Hello", "Darkness", "My", "Old", "Friend"],
        ]
        sim = hierarchy_similarity(pos, neg)
        np.testing.assert_allclose(sim, [1, 2 / 5, 1, 0, 1 / 3, 0])


class TestDIHEStep:
    @pytest.mark.slow
    def test_three_player_step(self):
        cfg = DIHETrainConfig(gen_downs=4, steps_per_epoch=10)
        state, opts = init_dihe_state(cfg, jax.random.PRNGKey(0),
                                      image_size=64)
        step = jax.jit(make_dihe_train_step(cfg, opts))
        rng = np.random.default_rng(0)
        b = 2
        pos = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
        neg = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
        gen = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
        disc = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
        sim = np.array([0.5, 1.0], np.float32)

        new_state, metrics = step(state, pos, neg, gen, disc, sim)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # all three players updated
        def changed(a, b_):
            la = jax.tree.leaves(a)
            lb = jax.tree.leaves(b_)
            return any(not np.allclose(x, y) for x, y in zip(la, lb))

        assert changed(state.emb_params, new_state.emb_params)
        assert changed(state.gen_params, new_state.gen_params)
        assert changed(state.disc_params, new_state.disc_params)


class TestGANPretrainStep:
    def test_pretrain_step(self):
        cfg = GANPretrainConfig()
        init, step = make_gan_pretrain_step(cfg)
        # shrink for test speed: patch the generator depth via cfg-free
        # init at 64px with a 4-deep unet is not exposed here, so run at
        # 256px minimal batch instead? No - use the full path at 64px by
        # overriding UNetGenerator depth through monkeypatch-free init:
        # the pretrain step builds num_downs=8, which needs >=256px.
        state = init(jax.random.PRNGKey(0), image_size=256)
        step = jax.jit(step)
        rng = np.random.default_rng(1)
        gen_batch = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
        disc_batch = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
        new_state, metrics = step(state, gen_batch, disc_batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
