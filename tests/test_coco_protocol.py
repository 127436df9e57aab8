"""COCO-protocol referee tests: hand-computed values + cross-check against
the in-house 11-point VOC metric stack on the same fixtures.

The reference's sanity check pits its detector against pycocotools
(cvpce/cli/misc.py:54-101). Here the two independent implementations
grade the same synthetic corpus and both must hit their hand-derived
numbers — if either metric stack drifts, this catches it.
"""
import numpy as np
import pytest

from cvpce_tpu.eval.coco_protocol import (
    ImageDetections,
    evaluate_coco_protocol,
)
from cvpce_tpu.ops.metrics import calculate_metrics


def _img(det_boxes, det_scores, gt_boxes):
    return ImageDetections(np.asarray(det_boxes, np.float32),
                           np.asarray(det_scores, np.float32),
                           np.asarray(gt_boxes, np.float32))


GT = [[0, 0, 10, 10], [20, 20, 30, 30]]


class TestHandComputed:
    def test_perfect_detections(self):
        img = _img(GT, [0.9, 0.8], GT)
        res = evaluate_coco_protocol({None: [img]})
        assert res["ap"] == pytest.approx(1.0)
        assert res["ap50"] == pytest.approx(1.0)
        assert res["ar"] == pytest.approx(1.0)

    def test_tp_fp_tp_sequence_101pt(self):
        """dets: TP(0.9), FP(0.8), TP(0.7) over 2 GTs.
        Precision after each: 1, 1/2, 2/3; recall: .5, .5, 1.
        Envelope: [1, 2/3, 2/3]; 101-pt AP = (51*1 + 50*2/3)/101."""
        img = _img([GT[0], [50, 50, 60, 60], GT[1]], [0.9, 0.8, 0.7], GT)
        res = evaluate_coco_protocol({None: [img]},
                                     iou_thresholds=(0.5,))
        want = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
        assert res["ap50"] == pytest.approx(want)

        # the in-house stack on the SAME fixture: 11-pt VOC
        # = (6*1 + 5*2/3)/11
        inhouse = calculate_metrics(
            [np.asarray(GT, np.float32)],
            [np.asarray([GT[0], [50, 50, 60, 60], GT[1]], np.float32)],
            [np.asarray([0.9, 0.8, 0.7], np.float32)],
            iou_thresholds=(0.5,))
        want_voc = (6 * 1.0 + 5 * (2.0 / 3.0)) / 11
        assert inhouse[0.5]["ap"] == pytest.approx(want_voc)
        # protocols must disagree exactly as their definitions say
        assert res["ap50"] != pytest.approx(want_voc)

    def test_area_ranges_ignore_semantics(self):
        """GT[0] is 10x10 (area 100 < 32^2 -> 'small'); GT[1] scaled to
        100x100 ('large'). In the 'large' range the small GT is ignored:
        its matching det is ignored too (not an FP), npig = 1."""
        big_gt = [40, 40, 140, 140]
        img = _img([GT[0], big_gt], [0.9, 0.8], [GT[0], big_gt])
        res = evaluate_coco_protocol({None: [img]}, iou_thresholds=(0.5,))
        assert res["per_area"]["large"] == pytest.approx(1.0)
        assert res["per_area"]["small"] == pytest.approx(1.0)
        assert res["ap50"] == pytest.approx(1.0)

    def test_unmatched_out_of_range_det_is_ignored_not_fp(self):
        big_gt = [40, 40, 140, 140]
        # small false positive far away: in 'large' eval it must be
        # ignored (out of range + unmatched), leaving AP = 1
        img = _img([big_gt, [200, 200, 205, 205]], [0.9, 0.8], [big_gt])
        res = evaluate_coco_protocol({None: [img]}, iou_thresholds=(0.5,),
                                     area_ranges=("large",))
        assert res["per_area"]["large"] == pytest.approx(1.0)

    def test_max_dets_truncation(self):
        # top-scored det is the FP; with max_dets=1 no TP remains
        img = _img([[50, 50, 60, 60], GT[0]], [0.9, 0.8], [GT[0]])
        res = evaluate_coco_protocol({None: [img]}, iou_thresholds=(0.5,),
                                     max_dets=1)
        assert res["ap50"] == pytest.approx(0.0)
        res_full = evaluate_coco_protocol({None: [img]},
                                          iou_thresholds=(0.5,))
        # envelope precision at all recalls = 1/2
        assert res_full["ap50"] == pytest.approx(0.5)

    def test_iou_sweep_penalizes_loose_boxes(self):
        # det overlaps GT with IoU ~0.6: counts at 0.5, not at 0.75
        gt = [[0, 0, 10, 10]]
        det = [[0, 0, 10, 13.4]]  # IoU = 100/134 ~ 0.746
        img = _img(det, [0.9], gt)
        res = evaluate_coco_protocol({None: [img]})
        assert res["ap50"] == pytest.approx(1.0)
        assert res["ap75"] == pytest.approx(0.0)
        assert 0.4 < res["ap"] < 0.7  # 6 of 10 thresholds pass

    def test_greedy_matching_prefers_highest_iou(self):
        """A high-score det overlapping two GTs must take the higher-IoU
        one, leaving the other for the next det."""
        gts = [[0, 0, 10, 10], [8, 0, 18, 10]]
        dets = [[7, 0, 17, 10], [0, 0, 10, 10]]
        img = _img(dets, [0.9, 0.8], gts)
        res = evaluate_coco_protocol({None: [img]}, iou_thresholds=(0.5,))
        assert res["ap50"] == pytest.approx(1.0)


class TestCrossCheck:
    def test_both_protocols_agree_on_extremes(self):
        rng = np.random.default_rng(0)
        targets, preds, confs = [], [], []
        imgs = []
        for _ in range(5):
            n = int(rng.integers(3, 8))
            xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
            wh = rng.uniform(10, 40, (n, 2)).astype(np.float32)
            gt = np.concatenate([xy, xy + wh], 1)
            scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
            targets.append(gt)
            preds.append(gt.copy())
            confs.append(scores)
            imgs.append(_img(gt.copy(), scores, gt))
        res = evaluate_coco_protocol({None: imgs}, iou_thresholds=(0.5,))
        inhouse = calculate_metrics(targets, preds, confs, iou_thresholds=(0.5,))
        assert res["ap50"] == pytest.approx(1.0)
        assert inhouse[0.5]["ap"] == pytest.approx(1.0)

    def test_protocols_track_each_other_on_noisy_corpus(self):
        rng = np.random.default_rng(1)
        targets, preds, confs = [], [], []
        imgs = []
        for _ in range(8):
            n = int(rng.integers(4, 10))
            xy = rng.uniform(0, 300, (n, 2)).astype(np.float32)
            wh = rng.uniform(15, 50, (n, 2)).astype(np.float32)
            gt = np.concatenate([xy, xy + wh], 1)
            jitter = rng.normal(0, 2.0, gt.shape).astype(np.float32)
            det = gt + jitter
            # add two far-off false positives per image
            fps = np.asarray([[400, 400, 430, 430], [450, 450, 470, 490]],
                             np.float32) + rng.uniform(0, 20, (2, 4)).astype(
                                 np.float32)
            det = np.concatenate([det, fps], 0)
            scores = rng.uniform(0.3, 1.0, len(det)).astype(np.float32)
            targets.append(gt)
            preds.append(det)
            confs.append(scores)
            imgs.append(_img(det, scores, gt))
        res = evaluate_coco_protocol({None: imgs}, iou_thresholds=(0.5,))
        inhouse = calculate_metrics(targets, preds, confs, iou_thresholds=(0.5,))
        # different interpolation/matching, same corpus: within a few pts
        assert abs(res["ap50"] - inhouse[0.5]["ap"]) < 0.12  # protocols legitimately differ by a few pts
