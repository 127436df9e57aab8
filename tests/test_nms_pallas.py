"""Pallas NMS kernel vs the XLA reference implementation (interpret mode
on CPU; the compiled path runs on TPU)."""
import numpy as np
import pytest

from cvpce_tpu.ops.nms import nms_mask
from cvpce_tpu.ops.nms_pallas import nms_mask_pallas


def random_boxes(rng, n, extent=400.0):
    xy = rng.uniform(0, extent, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 60, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], -1)


@pytest.mark.parametrize("n,seed", [(64, 0), (256, 1), (500, 2)])
def test_matches_xla_nms(n, seed):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, n)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1

    want = np.asarray(nms_mask(boxes, scores, valid, 0.5))
    got = np.asarray(nms_mask_pallas(boxes, scores, valid, 0.5,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)


def test_threshold_variants():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 128, extent=100.0)  # dense -> many overlaps
    scores = rng.uniform(size=128).astype(np.float32)
    valid = np.ones(128, bool)
    for thr in (0.3, 0.5, 0.7):
        want = np.asarray(nms_mask(boxes, scores, valid, thr))
        got = np.asarray(nms_mask_pallas(boxes, scores, valid, thr,
                                         interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"thr={thr}")


def test_all_invalid():
    boxes = np.zeros((32, 4), np.float32)
    scores = np.zeros(32, np.float32)
    valid = np.zeros(32, bool)
    got = np.asarray(nms_mask_pallas(boxes, scores, valid, interpret=True))
    assert not got.any()


@pytest.mark.parametrize("method", ["gaussian", "linear"])
def test_soft_nms_matches_xla(method):
    from cvpce_tpu.ops.nms import soft_nms_scores
    from cvpce_tpu.ops.nms_pallas import soft_nms_scores_pallas

    rng = np.random.default_rng(7)
    n = 120
    boxes = random_boxes(rng, n, extent=150.0)
    scores = rng.uniform(size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1

    want = np.asarray(soft_nms_scores(boxes, scores, valid, 0.5, 0.5,
                                      method))
    got = np.asarray(soft_nms_scores_pallas(boxes, scores, valid, 0.5, 0.5,
                                            method, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
