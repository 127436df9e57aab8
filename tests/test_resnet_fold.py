"""fold_frozen_bn: the norm='none'+biased-conv twin is exact.

The GLN backbone runs FrozenBN after every bias-free conv
(cvpce/models/proposals.py:183-191 via torchvision FrozenBatchNorm2d);
folding the affine into kernel scales + biases must be a no-op on the
math for serving (PERF.md r4 trunk work).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpce_tpu.models.resnet import ResNet50, fold_frozen_bn


def _randomize_frozen(frozen, rng):
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if k == "fbn":
                n = np.asarray(v["scale"]).shape[0]
                out[k] = {
                    "scale": jnp.asarray(rng.uniform(0.5, 2.0, n),
                                         jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 0.5, n), jnp.float32),
                    "mean": jnp.asarray(rng.normal(0, 0.5, n), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2.0, n),
                                       jnp.float32),
                }
            else:
                out[k] = walk(v)
        return out

    return walk(frozen)


@pytest.fixture(scope="module")
def frozen_setup():
    model = ResNet50(norm="frozen", dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = dict(variables)
    variables["frozen"] = _randomize_frozen(
        variables["frozen"], np.random.default_rng(1))
    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 96, 3)),
                    jnp.float32)
    return model, variables, x


def test_fold_exact_f32(frozen_setup):
    model, variables, x = frozen_setup
    ref = model.apply(variables, x)
    folded_model = ResNet50(norm="none", conv_bias=True, dtype=jnp.float32)
    folded = folded_model.apply(fold_frozen_bn(variables), x)
    for tap in ("c1", "c2", "c3", "c4", "c5"):
        np.testing.assert_allclose(np.asarray(folded[tap]),
                                   np.asarray(ref[tap]),
                                   rtol=2e-4, atol=2e-4)


def test_fold_close_bf16(frozen_setup):
    _, variables, x = frozen_setup
    model = ResNet50(norm="frozen", dtype=jnp.bfloat16)
    ref = model.apply(variables, x)["c5"].astype(jnp.float32)
    folded_model = ResNet50(norm="none", conv_bias=True,
                            dtype=jnp.bfloat16)
    out = folded_model.apply(fold_frozen_bn(variables),
                             x)["c5"].astype(jnp.float32)
    ref_n = np.asarray(ref)
    cos = (np.sum(ref_n * np.asarray(out))
           / (np.linalg.norm(ref_n) * np.linalg.norm(np.asarray(out))))
    assert cos > 0.999


def test_fold_int8_static_close(frozen_setup):
    """Folding commutes with per-channel weight quantization: the int8
    folded twin stays close to the int8 frozen path (act scales are
    calibrated on identical activations, so they transfer)."""
    _, variables, x = frozen_setup
    from cvpce_tpu.models.quant import calibrate_act_scales

    cal = ResNet50(norm="frozen", dtype=jnp.bfloat16, quant="calibrate")
    cal_vars = calibrate_act_scales(cal, dict(variables), [x])
    q_frozen = ResNet50(norm="frozen", dtype=jnp.bfloat16, quant="static")
    ref = q_frozen.apply(cal_vars, x)["c5"].astype(jnp.float32)

    folded_vars = fold_frozen_bn(cal_vars)
    q_folded = ResNet50(norm="none", conv_bias=True, dtype=jnp.bfloat16,
                        quant="static")
    out = q_folded.apply(folded_vars, x)["c5"].astype(jnp.float32)
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    cos = (np.sum(ref_n * out_n)
           / (np.linalg.norm(ref_n) * np.linalg.norm(out_n)))
    assert cos > 0.99


def test_fold_gln_backbone_exact():
    """GLN-level fold: the fold_backbone_fbn serving twin matches the
    frozen-BN GLN on raw head outputs (f32, small canvas)."""
    from cvpce_tpu.models.gln import GLN, GLNConfig, fold_gln_backbone

    cfg = GLNConfig(canvas_h=64, canvas_w=96, compute_dtype="float32")
    model = GLN(config=cfg)
    x = jnp.asarray(np.random.default_rng(5).random((1, 64, 96, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = dict(variables)
    variables["frozen"] = {
        "body": _randomize_frozen(variables["frozen"]["body"],
                                  np.random.default_rng(6))}
    ref = model.apply(variables, x)

    folded_model = GLN(config=GLNConfig(canvas_h=64, canvas_w=96,
                                        compute_dtype="float32",
                                        fold_backbone_fbn=True))
    out = folded_model.apply(fold_gln_backbone(variables), x)
    for key in ("cls_logits", "bbox_regression", "gaussians"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=5e-4, atol=5e-4)
