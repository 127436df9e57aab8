"""bench.py calibration helpers (the driver-consumed benchmark relies on
these editing the right leaves)."""
import jax
import jax.numpy as jnp
import numpy as np

import bench
from cvpce_tpu.models.gln import GLN, GLNConfig


def _tiny_gln_vars():
    cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                    detections_per_img=64)
    model = GLN(config=cfg, train=False)
    x = jnp.zeros((1, 64, 64, 3))
    return model, cfg, model.init(jax.random.PRNGKey(0), x), x


def test_shift_moves_logits_uniformly():
    model, cfg, variables, x = _tiny_gln_vars()
    shifted = bench._shift_cls_bias(variables, -3.0)
    l0 = model.apply(variables, x)["cls_logits"]
    l1 = model.apply(shifted, x)["cls_logits"]
    np.testing.assert_allclose(np.asarray(l1 - l0), -3.0, atol=1e-5)


def test_scale_widens_logit_spread():
    model, cfg, variables, x = _tiny_gln_vars()
    xr = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    scaled = bench._scale_cls_kernel(variables, 50.0)
    s0 = float(np.asarray(model.apply(variables, xr)["cls_logits"]).std())
    s1 = float(np.asarray(model.apply(scaled, xr)["cls_logits"]).std())
    assert s1 > 10 * s0 > 0


def test_edit_touches_only_cls_head():
    _, _, variables, _ = _tiny_gln_vars()
    shifted = bench._shift_cls_bias(variables, 1.0)
    changed = []
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(shifted["params"])):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            changed.append(jax.tree_util.keystr(pa))
    assert changed == ["['head']['cls_logits']['bias']"], changed
