"""GLN model tests: forward shapes, postprocess semantics, box coding,
train-step smoke (tiny canvas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpce_tpu.models.gln import GLN, GLNConfig, postprocess_detections
from cvpce_tpu.ops import anchors as anc
from cvpce_tpu.ops.boxes import decode_boxes, encode_boxes

CFG = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                detections_per_img=64)


@pytest.fixture(scope="module")
def gln_vars():
    model = GLN(config=CFG, train=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x)


class TestForward:
    def test_output_shapes(self, gln_vars):
        model = GLN(config=CFG, train=False)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        out = model.apply(gln_vars, x)
        total_anchors = sum(CFG.anchors()[1])
        assert out["cls_logits"].shape == (2, total_anchors, 1)
        assert out["bbox_regression"].shape == (2, total_anchors, 4)
        assert out["gaussians"].shape == (2, 32, 32, 1)

    def test_prior_probability_bias(self, gln_vars):
        """Fresh cls logits should sigmoid to ~0.01 (focal prior init)."""
        model = GLN(config=CFG, train=False)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        out = model.apply(gln_vars, x)
        mean_p = float(jax.nn.sigmoid(out["cls_logits"]).mean())
        assert 0.001 < mean_p < 0.1


class TestBoxCoding:
    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(0)
        anchors = rng.uniform(0, 100, (32, 2)).astype(np.float32)
        anchors = np.concatenate([anchors, anchors + 20], -1)
        gt = anchors + rng.uniform(-5, 5, anchors.shape).astype(np.float32)
        deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
        back = decode_boxes(deltas, jnp.asarray(anchors))
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


class TestPostprocess:
    def test_planted_detection_survives(self, gln_vars):
        anchors, counts = CFG.anchors()
        total = len(anchors)
        logits = np.full((1, total, 1), -8.0, np.float32)
        regs = np.zeros((1, total, 4), np.float32)
        # plant two strong detections on distinct, well-separated anchors
        # (ratio-1.0 P3 anchors at different grid cells)
        i1 = 3 + 9 * (0 * 8 + 1)   # cell (0, 1)
        i2 = 3 + 9 * (6 * 8 + 6)   # cell (6, 6)
        logits[0, i1, 0] = 4.0
        logits[0, i2, 0] = 3.0
        out = {
            "cls_logits": jnp.asarray(logits),
            "bbox_regression": jnp.asarray(regs),
            "gaussians": jnp.zeros((1, 32, 32, 1)),
        }
        res = postprocess_detections(
            out, jnp.asarray(anchors), counts,
            jnp.asarray([[64, 64]], jnp.float32), CFG)
        valid = np.asarray(res["valid"][0])
        scores = np.asarray(res["scores"][0])
        boxes = np.asarray(res["boxes"][0])
        assert valid.sum() == 2
        # scores sorted desc, sigmoid(4) then sigmoid(3)
        assert scores[0] == pytest.approx(1 / (1 + np.exp(-4)), abs=1e-4)
        assert scores[1] == pytest.approx(1 / (1 + np.exp(-3)), abs=1e-4)
        # boxes clipped to the image
        assert (boxes[:2] >= 0).all() and (boxes[:2] <= 64).all()

    def test_duplicate_suppressed_by_nms(self, gln_vars):
        anchors, counts = CFG.anchors()
        total = len(anchors)
        logits = np.full((1, total, 1), -8.0, np.float32)
        # same cell, ratio 1.0 scale indices 3..5 anchors heavily overlap
        base = 9 * (3 * 8 + 3)
        logits[0, base + 3, 0] = 4.0
        logits[0, base + 4, 0] = 3.5
        out = {
            "cls_logits": jnp.asarray(logits),
            "bbox_regression": jnp.zeros((1, total, 4), jnp.float32),
            "gaussians": jnp.zeros((1, 32, 32, 1)),
        }
        res = postprocess_detections(
            out, jnp.asarray(anchors), counts,
            jnp.asarray([[64, 64]], jnp.float32), CFG)
        # anchors at same center, sizes 32 vs 40.3 -> IoU ~ (32/40.3)^2
        # ~ 0.63 > 0.5 -> suppressed
        assert np.asarray(res["valid"][0]).sum() == 1


class TestTrainStepSmoke:
    def test_single_step_updates_params(self):
        from cvpce_tpu.train.gln import (GLNTrainConfig, init_train_state,
                                         make_train_step)

        train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64,
                                   steps_per_epoch=10)
        anchors, _ = CFG.anchors()
        state, optimizer = init_train_state(CFG, train_cfg,
                                            jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(CFG, train_cfg, anchors, optimizer))

        rng = np.random.default_rng(0)
        images = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        boxes = np.array([[[4, 4, 20, 20], [30, 30, 50, 50],
                           [10, 40, 26, 60], [0, 0, 0, 0]]], np.float32)
        valid = np.array([[True, True, True, False]])
        sizes = np.full((1, 2), 64, np.int32)

        new_state, metrics = step(state, images, boxes, valid, sizes)
        for k in ("classification", "bbox_regression", "gaussian", "total"):
            assert np.isfinite(float(metrics[k])), k
        # trainable params changed...
        before = np.asarray(
            state.params["head"]["cls_logits"]["bias"])
        after = np.asarray(
            new_state.params["head"]["cls_logits"]["bias"])
        assert not np.allclose(before, after)
        # ...frozen stem did not (trainable_layers=4 freezes conv1)
        b0 = np.asarray(state.params["body"]["conv1"]["kernel"])
        a0 = np.asarray(new_state.params["body"]["conv1"]["kernel"])
        np.testing.assert_array_equal(b0, a0)


class TestPostprocessVariants:
    def _planted_outputs(self):
        anchors, counts = CFG.anchors()
        total = len(anchors)
        logits = np.full((1, total, 1), -8.0, np.float32)
        base = 9 * (3 * 8 + 3)
        logits[0, base + 3, 0] = 4.0   # two overlapping anchors
        logits[0, base + 4, 0] = 3.5
        return {
            "cls_logits": jnp.asarray(logits),
            "bbox_regression": jnp.zeros((1, total, 4), jnp.float32),
            "gaussians": jnp.zeros((1, 32, 32, 1)),
        }, anchors, counts

    def test_soft_nms_mode_keeps_decayed_duplicate(self):
        import dataclasses

        out, anchors, counts = self._planted_outputs()
        cfg = dataclasses.replace(CFG, nms_mode="soft")
        res = postprocess_detections(
            out, jnp.asarray(anchors), counts,
            jnp.asarray([[64, 64]], jnp.float32), cfg)
        valid = np.asarray(res["valid"][0])
        scores = np.asarray(res["scores"][0])
        # soft NMS decays but does not remove the duplicate (its decayed
        # score stays above the 0.05 threshold here)
        assert valid.sum() == 2
        assert scores[1] < 1 / (1 + np.exp(-3.5))  # decayed below raw

    def test_merge_boxes_mode_runs(self):
        import dataclasses

        out, anchors, counts = self._planted_outputs()
        cfg = dataclasses.replace(CFG, merge_boxes=True)
        res = postprocess_detections(
            out, jnp.asarray(anchors), counts,
            jnp.asarray([[64, 64]], jnp.float32), cfg)
        assert np.asarray(res["valid"][0]).sum() == 1
        assert np.isfinite(np.asarray(res["boxes"][0])).all()
