"""Golden-value parity tests for the detection metric stack.

The numeric fixtures pin the exact metric semantics of the reference
(test/metrics_test.py in laitalaj/cvpce): a 3-image toy corpus with
hand-computed IoUs, greedy-match outcomes, merged P/R curves, the 11-point
AP closed form, and the full calculate_metrics output.
"""
import numpy as np
import pytest

from cvpce_tpu.ops import boxes as boxops
from cvpce_tpu.ops import metrics

TARGETS = [
    np.array([[0, 0, 1, 1], [1, 0, 2, 1], [1, 1, 2, 2]], np.float32),
    np.array([[1, 1, 2, 2], [3, 1, 4, 2], [5, 1, 6, 2], [7, 1, 8, 2]], np.float32),
    np.array([[0, 0, 5, 5], [5, 5, 10, 10]], np.float32),
]

PREDICTIONS = [
    np.array([[0, 0, 0.9, 0.9], [1.1, 0.1, 1.9, 0.9], [0, 0, 1, 1],
              [0.9, 0.9, 2.1, 2.1], [3, 3, 4, 4]], np.float32),
    np.array([[1, 0, 2, 1], [1, 1, 2, 2], [5, 1, 6, 2],
              [7, 1.1, 8, 1.9], [9, 9, 10, 10]], np.float32),
    np.array([[0, 0, 1, 1], [1, 1, 3, 3], [0.5, 0.5, 4.5, 4.5],
              [0, 0, 6, 6], [6, 6, 9, 9]], np.float32),
]

CONFIDENCES = [
    np.array([1, 0.8, 0.6, 0.4, 0.2], np.float32),
    np.array([0.9, 0.8, 0.7, 0.65, 0.5], np.float32),
    np.array([0.85, 0.6, 0.4, 0.2, 0.1], np.float32),
]


def test_pairwise_iou_image2():
    ious = np.asarray(boxops.pairwise_iou(PREDICTIONS[2], TARGETS[2]))
    expected = np.array([
        [0.04, 0],
        [0.16, 0],
        [0.64, 0],
        [25 / 36, 1 / (25 + 36 - 1)],
        [0, 0.36],
    ], np.float32)
    np.testing.assert_allclose(ious, expected, rtol=1e-5, atol=1e-7)


def test_pairwise_iou_image0():
    ious = np.asarray(boxops.pairwise_iou(PREDICTIONS[0], TARGETS[0]))
    expected = np.array([
        [0.81, 0, 0],
        [0, 0.64, 0],
        [1.0, 0, 0],
        [0.01 / (1.44 + 1 - 0.01), 0.1 / (1.44 + 1 - 0.1), 1 / 1.44],
        [0, 0, 0],
    ], np.float32)
    np.testing.assert_allclose(ious, expected, rtol=1e-5, atol=1e-7)


def test_greedy_match_threshold_065():
    tp, conf = metrics.match_detections(
        TARGETS[0], PREDICTIONS[0], CONFIDENCES[0], [0.65]
    )
    np.testing.assert_allclose(tp[0], [1, 0, 0, 1, 0])
    np.testing.assert_allclose(conf, [1, 0.8, 0.6, 0.4, 0.2])


def _merged_tp_conf():
    tps, confs = [], []
    for t, p, c in zip(TARGETS, PREDICTIONS, CONFIDENCES):
        tp, conf = metrics.match_detections(t, p, c, [0.5])
        tps.append(tp[0])
        confs.append(conf)
    merged_conf = np.concatenate(confs)
    order = np.argsort(-merged_conf, kind="stable")
    return np.concatenate(tps)[order], merged_conf[order]


def test_merged_matches():
    tp, conf = _merged_tp_conf()
    expected_tp = np.array([1, 0, 0, 1, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 0], np.float32)
    expected_conf = np.array(
        [1, 0.9, 0.85, 0.8, 0.8, 0.7, 0.65, 0.6, 0.6, 0.5, 0.4, 0.4, 0.2, 0.2, 0.1],
        np.float32,
    )
    np.testing.assert_allclose(tp, expected_tp)
    np.testing.assert_allclose(conf, expected_conf)


def test_precision_recall_curves():
    tp, _ = _merged_tp_conf()
    p, r = metrics.precision_and_recall(tp, 1 - tp, 9)
    expected_p = np.array([1, 1/2, 1/3, 2/4, 3/5, 4/6, 5/7, 5/8, 5/9, 5/10,
                           6/11, 7/12, 7/13, 7/14, 7/15])
    expected_r = np.array([1/9, 1/9, 1/9, 2/9, 3/9, 4/9, 5/9, 5/9, 5/9, 5/9,
                           6/9, 7/9, 7/9, 7/9, 7/9])
    np.testing.assert_allclose(p, expected_p, rtol=1e-6)
    np.testing.assert_allclose(r, expected_r, rtol=1e-6)


def test_eleven_point_ap():
    tp, _ = _merged_tp_conf()
    p, r = metrics.precision_and_recall(tp, 1 - tp, 9)
    ap = metrics.average_precision(p, r)
    expected = (1 + 1 + 5/7 + 5/7 + 5/7 + 5/7 + 7/12 + 7/12 + 0 + 0 + 0) / 11
    assert ap == pytest.approx(expected, rel=1e-6)


def test_calculate_metrics_full():
    res = metrics.calculate_metrics(TARGETS, PREDICTIONS, CONFIDENCES)
    expected_p = 7 / 12
    expected_r = 7 / 9
    expected_f = 2 * expected_p * expected_r / (expected_p + expected_r)
    expected_ap = (1 + 1 + 5/7 + 5/7 + 5/7 + 5/7 + 7/12 + 7/12) / 11
    expected_ar = (1 + 3/4 + 1/2) / 3
    assert res[0.5]["ap"] == pytest.approx(expected_ap, rel=1e-6)
    assert res[0.5]["ar_300"] == pytest.approx(expected_ar, rel=1e-6)
    assert res[0.5]["p"] == pytest.approx(expected_p, rel=1e-6)
    assert res[0.5]["r"] == pytest.approx(expected_r, rel=1e-6)
    assert res[0.5]["f"] == pytest.approx(expected_f, rel=1e-6)


def test_calculate_metrics_multi_threshold():
    res = metrics.calculate_metrics(
        TARGETS, PREDICTIONS, CONFIDENCES, iou_thresholds=(0.5, 0.75)
    )
    assert set(res.keys()) == {0.5, 0.75}
    assert res[0.75]["ap"] <= res[0.5]["ap"]


def test_empty_predictions():
    res = metrics.calculate_metrics(
        [TARGETS[0]], [np.zeros((0, 4), np.float32)], [np.zeros(0, np.float32)]
    )
    assert res[0.5]["ap"] == 0.0
    assert res[0.5]["f"] == 0.0


def test_streaming_metrics_matches_batch():
    from cvpce_tpu.ops.metrics import StreamingMetrics

    streaming = metrics.StreamingMetrics((0.5,))
    for t, p, c in zip(TARGETS, PREDICTIONS, CONFIDENCES):
        streaming.add(t, p, c)
    got = streaming.result()
    want = metrics.calculate_metrics(TARGETS, PREDICTIONS, CONFIDENCES)
    for key in ("ap", "ar_300", "p", "r", "f", "c"):
        assert got[0.5][key] == pytest.approx(want[0.5][key], rel=1e-6), key


def test_prfc_plot_smoke(tmp_path):
    from cvpce_tpu.utils.viz import plot_prfc

    res = metrics.calculate_metrics(TARGETS, PREDICTIONS, CONFIDENCES)
    raw = res[0.5]["raw"]
    out = str(tmp_path / "prfc.png")
    plot_prfc(raw["p"], raw["r"], raw["f"], raw["c"], out, title="golden")
    import os
    assert os.path.getsize(out) > 0


def test_one_prediction_consumes_all_overlapping_targets():
    """Pins the reference's greedy-matcher quirk (metrics.py:21-31): the
    loop does not break after the first unused target, so a prediction
    overlapping TWO unused targets above threshold marks BOTH used; a
    later prediction matching either of them becomes a false positive."""
    targets = np.array([[0, 0, 10, 10], [8, 0, 18, 10]], np.float32)
    preds = np.array([
        [0, 0, 17, 10],    # IoU 10/17 ~ 0.59 with t0, ~0.53 with t1
        [0, 0, 10, 10],    # exact match of t0 — but t0 is already used
    ], np.float32)
    conf = np.array([0.9, 0.8], np.float32)
    tp, _ = metrics.match_detections(targets, preds, conf, [0.5])
    np.testing.assert_allclose(tp[0], [1, 0])
