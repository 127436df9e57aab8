"""Unit tests: anchor generation, matcher semantics, loss functions."""
import numpy as np
import pytest

from cvpce_tpu.ops import anchors as anc
from cvpce_tpu.ops import losses
from cvpce_tpu.ops.matching import match_anchors


class TestAnchors:
    def test_cell_anchors_level3(self):
        base = anc.cell_anchors(3)
        assert base.shape == (9, 4)
        # ratio 1.0, scale 32 -> [-16, -16, 16, 16]
        np.testing.assert_array_equal(base[3], [-16, -16, 16, 16])
        # ratio 0.5 (wide): w = 32 * 2^.5 ~ 45.25 -> +-23 after round
        np.testing.assert_array_equal(base[0], [-23, -11, 23, 11])
        # ratio 2.0 (tall): transpose of the wide one
        np.testing.assert_array_equal(base[6], [-11, -23, 11, 23])

    def test_grid_counts(self):
        anchors, counts = anc.grid_anchors(64, 64)
        assert counts == [8 * 8 * 9, 4 * 4 * 9, 2 * 2 * 9, 1 * 1 * 9, 9]
        assert anchors.shape == (sum(counts), 4)

    def test_grid_shift(self):
        anchors, counts = anc.grid_anchors(64, 64)
        lvl3 = anchors[: counts[0]].reshape(8, 8, 9, 4)
        # anchor centers shift by the stride along x
        np.testing.assert_allclose(lvl3[0, 1, 3] - lvl3[0, 0, 3],
                                   [8, 0, 8, 0])
        np.testing.assert_allclose(lvl3[1, 0, 3] - lvl3[0, 0, 3],
                                   [0, 8, 0, 8])


class TestMatcher:
    ANCHORS = np.array([
        [0, 0, 10, 10],        # IoU 1.0 with gt0 -> fg
        [0, 0, 9, 10],         # IoU 0.9 with gt0 -> fg
        [5, 5, 15, 15],        # IoU ~0.14 with gt0 -> bg
        [0, 0, 11, 10],        # IoU ~0.909 with gt0 -> fg
        [100, 100, 110, 110],  # no overlap -> bg
        [40, 40, 51, 50],      # IoU ~0.909 with gt1 -> fg (gt1's best)
        [40, 40, 62, 50],      # IoU ~0.455 with gt1 -> ignore band
        [200, 200, 210, 210],  # gt2's best anchor, IoU ~0.44 -> low-quality fg
    ], np.float32)

    GTS = np.array([
        [0, 0, 10, 10],
        [40, 40, 50, 50],
        [198, 200, 206, 212],  # best anchor is idx 7 with IoU < 0.5
    ], np.float32)

    def test_thresholds_and_low_quality(self):
        matched, fg, valid = match_anchors(
            self.ANCHORS, self.GTS, np.ones(3, bool), chunk=8
        )
        matched, fg, valid = map(np.asarray, (matched, fg, valid))
        assert fg[0] and matched[0] == 0
        assert fg[1] and matched[1] == 0
        assert not fg[2] and valid[2]          # background
        assert fg[3] and matched[3] == 0
        assert not fg[4] and valid[4]          # background
        assert fg[5] and matched[5] == 1
        assert not fg[6] and not valid[6]      # in the ignore band
        assert fg[7] and matched[7] == 2       # low-quality forced match

    def test_no_low_quality(self):
        matched, fg, valid = match_anchors(
            self.ANCHORS, self.GTS, np.ones(3, bool), chunk=8,
            allow_low_quality=False,
        )
        assert not bool(np.asarray(fg)[7])

    def test_padded_gt_ignored(self):
        gts = np.concatenate([self.GTS, np.zeros((5, 4), np.float32)])
        valid_t = np.arange(8) < 3
        matched, fg, _ = match_anchors(self.ANCHORS, gts, valid_t, chunk=8)
        assert np.asarray(fg).sum() == 5


class TestFocalLoss:
    def test_matches_manual_formula(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(16,)).astype(np.float32)
        targets = (rng.uniform(size=16) > 0.7).astype(np.float32)
        got = np.asarray(losses.sigmoid_focal_loss(logits, targets))

        p = 1 / (1 + np.exp(-logits))
        ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
        p_t = p * targets + (1 - p) * (1 - targets)
        alpha_t = 0.25 * targets + 0.75 * (1 - targets)
        want = alpha_t * ce * (1 - p_t) ** 2
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestGaussianLoss:
    def test_hard_negative_mining(self):
        # 2 positives, 8 negatives; min_negatives=3 -> k = max(3, 3*2) = 6
        tgt = np.array([0.5, 0.9, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)
        pred = np.array([0.4, 0.5, 0.9, 0.8, 0.7, 0.3, 0.2, 0.1, 0.05, 0.01],
                        np.float32)
        got = float(losses.gaussian_heatmap_loss(
            pred, tgt, min_negatives=3, negatives_per_positive=3
        ))
        pos_se = [(0.4 - 0.5) ** 2, (0.5 - 0.9) ** 2]
        neg_se = sorted([p**2 for p in pred[2:]], reverse=True)[:6]
        want = (sum(pos_se) + sum(neg_se)) / (2 + 6)
        assert got == pytest.approx(want, rel=1e-5)

    def test_min_negatives_floor(self):
        # no positives -> k = min_negatives (capped by available)
        tgt = np.zeros(10, np.float32)
        pred = np.linspace(0, 0.9, 10).astype(np.float32)
        got = float(losses.gaussian_heatmap_loss(
            pred, tgt, min_negatives=4, negatives_per_positive=3
        ))
        neg_se = sorted((pred**2).tolist(), reverse=True)[:4]
        assert got == pytest.approx(sum(neg_se) / 4, rel=1e-5)


class TestZNCC:
    def _oracle(self, a, b):
        # reference semantics (cvpce/classification_training.py:151-163):
        # per (image, channel) sum((a-mu)(b-mu)) / (unbiased std product),
        # total divided by B*C*H*W
        total = 0.0
        bsz, h, w, c = a.shape
        for i in range(bsz):
            for ch in range(c):
                x = a[i, :, :, ch].ravel()
                y = b[i, :, :, ch].ravel()
                xc = x - x.mean()
                yc = y - y.mean()
                total += (xc * yc).sum() / (x.std(ddof=1) * y.std(ddof=1))
        return total / (bsz * c * h * w)

    def test_matches_loop_oracle(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(3, 8, 8, 3)).astype(np.float32)
        b = rng.uniform(size=(3, 8, 8, 3)).astype(np.float32)
        got = float(losses.zncc(a, b))
        assert got == pytest.approx(self._oracle(a, b), rel=1e-4)

    def test_identical_images_score_near_one(self):
        rng = np.random.default_rng(2)
        a = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
        n = 64
        assert float(losses.zncc(a, a)) == pytest.approx((n - 1) / n,
                                                         abs=1e-4)

    def test_masked_zncc(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
        b = a.copy()
        b[0, 4:] = rng.uniform(size=(4, 8, 3))  # corrupt bottom half
        mask = np.zeros((1, 8, 8), np.float32)
        mask[0, :4] = 1  # only compare the intact top half
        got = float(losses.masked_zncc(a, b, mask))
        # perfect correlation on 32 masked pixels, reference scale:
        # sum over 3 channels of (Nm-1) / (B*C*N) = 3*31 / (3*64)
        assert got == pytest.approx(31 / 64, abs=1e-3)


class TestTripletLoss:
    def test_margin_scales_with_similarity(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(4, 16)).astype(np.float32)
        p = a + 0.01 * rng.normal(size=(4, 16)).astype(np.float32)
        n = rng.normal(size=(4, 16)).astype(np.float32)
        lo = float(losses.hierarchical_triplet_loss(
            a, p, n, np.ones(4, np.float32)))      # sim 1 -> margin .05
        hi = float(losses.hierarchical_triplet_loss(
            a, p, n, np.zeros(4, np.float32)))     # sim 0 -> margin .5
        assert hi >= lo
