"""BN folding for embedder serving: MACVGG(batch_norm=True) variables
fold into the no-BN plan exactly (eval-mode BN is affine), including
through the int8-static path."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpce_tpu.models.embedders import (MACVGG, calibrate_int8_scales,
                                        fold_bn_variables)


def _randomized_bn_vars(rng_key, x):
    """Init the BN model, then randomize BN affine + running stats so the
    fold actually has to do arithmetic (init stats are identity)."""
    model = MACVGG(batch_norm=True)
    variables = model.init(rng_key, x)
    rng = np.random.default_rng(7)

    def randomize(tree, fields):
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict) and set(sub) & set(fields):
                out[name] = {
                    k: (jnp.asarray(
                        rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
                        if k in ("scale", "var") else
                        jnp.asarray(rng.normal(
                            0, 0.2, v.shape).astype(np.float32))
                        if k in ("bias", "mean") else v)
                    for k, v in sub.items()}
            else:
                out[name] = sub
        return out

    params = randomize(variables["params"], ("scale",))
    stats = randomize(variables["batch_stats"], ("mean", "var"))
    return model, {"params": params, "batch_stats": stats}


def test_fold_bn_exact():
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    model, variables = _randomized_bn_vars(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x))

    folded = fold_bn_variables(variables)
    plain = MACVGG(batch_norm=False)
    out = np.asarray(plain.apply(folded, x))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fold_bn_int8_static_path():
    """Folded no-BN model through calibrate -> int8 static serving stays
    close to the BN model's own int8 static path."""
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    model, variables = _randomized_bn_vars(jax.random.PRNGKey(1), x)
    folded = fold_bn_variables(variables)

    cal = MACVGG(batch_norm=False, int8_all=True, int8_calibrate=True)
    v_cal = calibrate_int8_scales(cal, folded, [x])
    serve = MACVGG(batch_norm=False, int8_all=True, int8_static=True)
    e8 = np.asarray(serve.apply(v_cal, x))

    ref = np.asarray(model.apply(variables, x))
    cos = (e8 * ref).sum(-1)
    assert (cos > 0.99).all(), cos

