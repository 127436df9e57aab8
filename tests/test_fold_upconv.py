"""Folded [upsample2x -> subnet conv1] equivalence (models/gln.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpce_tpu.models.gln import GaussianBranch


def test_folded_upconv_matches_reference_form():
    rng = np.random.default_rng(0)
    c2 = jnp.asarray(rng.uniform(-1, 1, (2, 16, 24, 256)).astype(
        np.float32))
    p3 = jnp.asarray(rng.uniform(-1, 1, (2, 8, 12, 256)).astype(
        np.float32))

    ref = GaussianBranch(fold_upsample=False)
    variables = ref.init(jax.random.PRNGKey(0), c2, p3)
    fold = GaussianBranch(fold_upsample=True)

    # identical param trees: the folded module registers the same
    # kernel/bias shapes under subnet_0, so checkpoints are intercompatible
    shapes_ref = jax.tree.map(lambda a: a.shape, variables)
    shapes_fold = jax.tree.map(
        lambda a: a.shape, fold.init(jax.random.PRNGKey(0), c2, p3))
    assert shapes_ref == shapes_fold

    out_ref = ref.apply(variables, c2, p3)
    out_fold = fold.apply(variables, c2, p3)
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_ref),
                               atol=2e-5)


def test_folded_upconv_tanh_mode():
    rng = np.random.default_rng(1)
    c2 = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 256)).astype(np.float32))
    p3 = jnp.asarray(rng.uniform(-1, 1, (1, 4, 4, 256)).astype(np.float32))
    ref = GaussianBranch(tanh=True, fold_upsample=False)
    variables = ref.init(jax.random.PRNGKey(0), c2, p3)
    fold = GaussianBranch(tanh=True, fold_upsample=True)
    np.testing.assert_allclose(
        np.asarray(fold.apply(variables, c2, p3)),
        np.asarray(ref.apply(variables, c2, p3)), atol=2e-5)
