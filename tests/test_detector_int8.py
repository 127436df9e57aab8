"""Detector int8 plumbing: GLNConfig(int8=...) threads the quantized
conv path through trunk stages + FPN + head towers (stem, predictors,
Gaussian branch stay in compute dtype), calibration records one scale
per quantized conv, and the static model serves with them.

AP parity on trained weights is validated separately on hardware
(scripts/detector_int8_check.py) — this test pins the mechanics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpce_tpu.models.gln import GLN, GLNConfig
from cvpce_tpu.models.quant import calibrate_act_scales

# trunk 48 block convs + 4 downsample convs + 8 FPN convs + 8 tower
# convs; stem / cls_logits / bbox_reg / gaussian branch excluded
EXPECTED_QCONVS = 68


@pytest.fixture(scope="module")
def gln_setup():
    cfg = GLNConfig(canvas_h=128, canvas_w=128, topk_candidates=50,
                    detections_per_img=20, max_nms_candidates=64)
    base = GLN(config=cfg)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    variables = base.init(jax.random.PRNGKey(0), x)
    return cfg, base, x, variables


def test_calibrate_then_static_serving(gln_setup):
    cfg, base, x, variables = gln_setup
    cal_model = GLN(config=dataclasses.replace(cfg, int8="calibrate"))
    v_cal = calibrate_act_scales(cal_model, variables, [x])

    scales = jax.tree.leaves(v_cal["act_scales"])
    assert len(scales) == EXPECTED_QCONVS
    assert all(float(s) > 0 for s in scales)

    static_model = GLN(config=dataclasses.replace(cfg, int8="static"))
    out = static_model.apply(v_cal, x)
    ref = base.apply(variables, x)
    for k in ("cls_logits", "bbox_regression", "gaussians"):
        assert out[k].shape == ref[k].shape
        assert np.isfinite(np.asarray(out[k])).all()
    # random-init logits are bias-dominated (-4.59); the quantized trunk
    # must not wreck that structure
    assert abs(float(jnp.mean(out["cls_logits"])) -
               float(jnp.mean(ref["cls_logits"]))) < 0.5


def test_static_without_scales_uses_zeros_guard(gln_setup):
    """An int8-static model applied WITHOUT calibrated scales must not
    NaN: the zero-init scale is clamped to 1e-8 (degenerate but finite),
    and init itself records dynamic scales."""
    cfg, base, x, variables = gln_setup
    static_model = GLN(config=dataclasses.replace(cfg, int8="static"))
    v2 = static_model.init(jax.random.PRNGKey(0), x)
    assert len(jax.tree.leaves(v2["act_scales"])) == EXPECTED_QCONVS


def test_checkpoint_params_identical(gln_setup):
    """int8 variants must not change the params tree: same names/shapes
    as the bf16 model so existing checkpoints load unchanged."""
    cfg, base, x, variables = gln_setup
    cal_model = GLN(config=dataclasses.replace(cfg, int8="calibrate"))
    v2 = cal_model.init(jax.random.PRNGKey(0), x)
    p1 = jax.tree.map(lambda a: a.shape, variables["params"])
    p2 = jax.tree.map(lambda a: a.shape, v2["params"])
    assert p1 == p2


def test_with_gaussians_gate(gln_setup):
    """GLNConfig(with_gaussians=False): same boxes/scores, no heatmap,
    and the full param tree (incl. gaussian branch) still loads."""
    from cvpce_tpu.models.gln import postprocess_detections

    cfg, base, x, variables = gln_setup
    gated = GLN(config=dataclasses.replace(cfg, with_gaussians=False))
    out_g = gated.apply(variables, x)
    assert "gaussians" not in out_g
    ref = base.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_g["cls_logits"]),
                               np.asarray(ref["cls_logits"]))
    np.testing.assert_allclose(np.asarray(out_g["bbox_regression"]),
                               np.asarray(ref["bbox_regression"]))

    anchors, counts = cfg.anchors()
    sizes = jnp.full((1, 2), 128.0)
    res = postprocess_detections(out_g, jnp.asarray(anchors), counts,
                                 sizes, cfg)
    assert "gaussians" not in res
    res_ref = postprocess_detections(ref, jnp.asarray(anchors), counts,
                                     sizes, cfg)
    np.testing.assert_allclose(np.asarray(res["boxes"]),
                               np.asarray(res_ref["boxes"]))
