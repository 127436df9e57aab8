"""Tests for fixed-shape NMS, fused crop-resize, and RANSAC homography."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpce_tpu.ops import image as imops
from cvpce_tpu.ops import nms as nmsops
from cvpce_tpu.ops import ransac as rnsc


class TestNMS:
    def test_basic_suppression(self):
        boxes = np.array([
            [0, 0, 10, 10],
            [1, 1, 11, 11],   # heavy overlap with 0
            [20, 20, 30, 30],
            [21, 21, 31, 31], # heavy overlap with 2
            [50, 50, 60, 60],
        ], np.float32)
        scores = np.array([0.9, 0.8, 0.7, 0.75, 0.6], np.float32)
        valid = np.ones(5, bool)
        keep = np.asarray(nmsops.nms_mask(boxes, scores, valid, 0.5))
        np.testing.assert_array_equal(keep, [True, False, False, True, True])

    def test_no_overlap_keeps_all(self):
        boxes = np.array([[i * 20, 0, i * 20 + 10, 10] for i in range(6)],
                         np.float32)
        scores = np.linspace(1, 0.5, 6).astype(np.float32)
        keep = np.asarray(nmsops.nms_mask(boxes, scores, np.ones(6, bool)))
        assert keep.all()

    def test_padding_excluded(self):
        boxes = np.zeros((8, 4), np.float32)
        boxes[0] = [0, 0, 10, 10]
        scores = np.zeros(8, np.float32)
        scores[0] = 0.9
        valid = np.arange(8) < 1
        keep = np.asarray(nmsops.nms_mask(boxes, scores, valid))
        assert keep[0] and not keep[1:].any()

    def test_nms_topk_shapes(self):
        rng = np.random.default_rng(0)
        boxes = rng.uniform(0, 100, (64, 2)).astype(np.float32)
        boxes = np.concatenate([boxes, boxes + 10], -1)
        scores = rng.uniform(size=64).astype(np.float32)
        b, s, v = nmsops.nms_topk(boxes, scores, np.ones(64, bool), k=16)
        assert b.shape == (16, 4) and s.shape == (16,) and v.shape == (16,)
        s = np.asarray(s)
        assert (np.diff(s[np.asarray(v)]) <= 1e-6).all()  # sorted desc

    def test_soft_nms_decays_overlaps(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [40, 40, 50, 50]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        out = np.asarray(nmsops.soft_nms_scores(boxes, scores, np.ones(3, bool)))
        assert out[0] == pytest.approx(0.9)       # top box untouched
        assert out[1] < 0.8                        # overlapped box decayed
        assert out[2] == pytest.approx(0.7, abs=1e-3)  # far box untouched


class TestCropResize:
    def test_matches_manual_pad_resize(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(40, 50, 3)).astype(np.float32)
        box = np.array([[5, 10, 25, 20]], np.float32)  # w=20, h=10
        out = np.asarray(imops.crop_resize_square(img, box, out_size=8))[0]

        crop = img[10:20, 5:25]
        canvas = np.full((20, 20, 3), 0.5, np.float32)
        canvas[:10, :20] = crop
        want = np.asarray(imops.resize_bilinear(canvas, 8, 8))
        np.testing.assert_allclose(out, want, atol=2e-2)

    def test_square_box_no_padding(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        box = np.array([[8, 8, 40, 40]], np.float32)
        out = np.asarray(imops.crop_resize_square(img, box, out_size=16))[0]
        want = np.asarray(imops.resize_bilinear(img[8:40, 8:40], 16, 16))
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_tanh_scaling_roundtrip(self):
        x = np.linspace(0, 1, 11).astype(np.float32)
        y = np.asarray(imops.scale_to_tanh(x))
        np.testing.assert_allclose(y, x * 2 - 1)
        np.testing.assert_allclose(np.asarray(imops.scale_from_tanh(y)), x,
                                   atol=1e-6)


class TestRansac:
    def _random_homography(self, rng):
        # affine-ish with mild perspective, like a shelf-photo homography;
        # large h[2,0:2] would put the horizon line inside the point domain
        h = np.eye(3)
        h[:2, :2] += rng.uniform(-0.1, 0.1, (2, 2))
        h[:2, 2] = rng.uniform(-20, 20, 2)
        h[2, :2] = rng.uniform(-1e-4, 1e-4, 2)
        return h

    def test_recovers_exact_homography(self):
        rng = np.random.default_rng(3)
        h_true = self._random_homography(rng)
        src = rng.uniform(0, 200, (40, 2)).astype(np.float32)
        ones = np.ones((40, 1))
        proj = (np.concatenate([src, ones], 1) @ h_true.T)
        dst = (proj[:, :2] / proj[:, 2:]).astype(np.float32)

        h, inl, ok = rnsc.find_homography_ransac(
            src, dst, np.ones(40, bool), jax.random.PRNGKey(0),
            reproj_threshold=2.0,
        )
        assert bool(ok)
        assert np.asarray(inl).sum() >= 38
        got = np.asarray(rnsc.project_points(h, src))
        err = np.abs(got - dst)
        assert err.max() < 2.0      # f32 DLT: ~sub-pixel on a 200px domain
        assert err.mean() < 0.75

    def test_robust_to_outliers(self):
        rng = np.random.default_rng(4)
        h_true = self._random_homography(rng)
        src = rng.uniform(0, 200, (60, 2)).astype(np.float32)
        ones = np.ones((60, 1))
        proj = np.concatenate([src, ones], 1) @ h_true.T
        dst = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
        dst[40:] += rng.uniform(80, 150, (20, 2)).astype(np.float32)  # outliers

        h, inl, ok = rnsc.find_homography_ransac(
            src, dst, np.ones(60, bool), jax.random.PRNGKey(1),
            reproj_threshold=3.0,
        )
        assert bool(ok)
        inl = np.asarray(inl)
        assert inl[:40].sum() >= 36
        assert inl[40:].sum() <= 3
        got = np.asarray(rnsc.project_points(h, src[:40]))
        np.testing.assert_allclose(got, dst[:40], atol=1.0)

    def test_project_boxes(self):
        h = jnp.eye(3).at[0, 2].set(5.0).at[1, 2].set(-3.0)
        boxes = np.array([[0, 0, 10, 10]], np.float32)
        out = np.asarray(rnsc.project_boxes(h, boxes))
        np.testing.assert_allclose(out, [[5, -3, 15, 7]], atol=1e-5)

    def test_too_few_points_not_ok(self):
        src = np.zeros((8, 2), np.float32)
        dst = np.zeros((8, 2), np.float32)
        valid = np.arange(8) < 3
        _, _, ok = rnsc.find_homography_ransac(
            src, dst, valid, jax.random.PRNGKey(2))
        assert not bool(ok)


class TestMergeBoxes:
    def test_weighted_merge(self):
        from cvpce_tpu.ops.nms import merge_boxes

        boxes = np.array([[0, 0, 10, 10], [2, 2, 12, 12],
                          [40, 40, 50, 50]], np.float32)
        scores = np.array([0.9, 0.6, 0.8], np.float32)
        valid = np.ones(3, bool)
        keep = np.array([True, False, True])
        merged = np.asarray(merge_boxes(boxes, scores, valid, keep, 0.3))
        # box 0 pulls toward box 1, weighted by iou*score
        iou01 = 64 / (200 - 64)
        w0, w1 = 1.0 * 0.9, iou01 * 0.6
        want0 = (w0 * boxes[0] + w1 * boxes[1]) / (w0 + w1)
        np.testing.assert_allclose(merged[0], want0, rtol=1e-5)
        # isolated kept box unchanged; suppressed box passes through
        np.testing.assert_allclose(merged[2], boxes[2], rtol=1e-6)
        np.testing.assert_allclose(merged[1], boxes[1])
