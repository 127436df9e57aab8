"""Serving-threshold calibration (pipeline/calibrate.py).

The reference hardcodes score > 0.5 at serving
(/root/reference/cvpce/production.py:14); calibrate_confidence picks the
max-F1 operating point on a held-out split instead and persists it next
to the checkpoint. These tests pin the resolution precedence and the
max-F1 selection on a controlled fake detector.
"""
import numpy as np
import pytest

from cvpce_tpu.models.gln import GLNConfig
from cvpce_tpu.pipeline.calibrate import (calibrate_confidence,
                                          calibration_dir_for_weights,
                                          load_calibration,
                                          resolve_input_norm,
                                          resolve_threshold,
                                          save_calibration)


def test_resolve_explicit_number_wins(tmp_path):
    save_calibration(str(tmp_path), {"threshold": 0.8})
    assert resolve_threshold(0.3, str(tmp_path)) == pytest.approx(0.3)
    assert resolve_threshold("0.25", str(tmp_path)) == pytest.approx(0.25)


def test_resolve_auto_reads_calibration(tmp_path):
    save_calibration(str(tmp_path), {"threshold": 0.62, "f1": 0.9})
    assert resolve_threshold("auto", str(tmp_path)) == pytest.approx(0.62)
    assert resolve_threshold(None, str(tmp_path)) == pytest.approx(0.62)


def test_resolve_falls_back_to_reference_default(tmp_path):
    # no calibration file -> the reference's fixed 0.5
    assert resolve_threshold("auto", str(tmp_path)) == pytest.approx(0.5)
    assert resolve_threshold("auto", None) == pytest.approx(0.5)


def test_calibration_dir_for_weights(tmp_path):
    """A GLN weights argument may be the run dir, the rotating
    `checkpoint` subdir, or a file inside it — calibration lives at the
    run-dir level and must be found from any of them."""
    run = tmp_path / "run"
    ckpt = run / "checkpoint"
    ckpt.mkdir(parents=True)
    (ckpt / "blob").write_text("x")
    save_calibration(str(run), {"threshold": 0.44})

    for weights in (run, ckpt, ckpt / "blob"):
        d = calibration_dir_for_weights(str(weights))
        assert resolve_threshold("auto", d) == pytest.approx(0.44), weights
    assert calibration_dir_for_weights(None) is None
    # no calibration anywhere -> innermost candidate, default threshold
    bare = tmp_path / "bare"
    bare.mkdir()
    d = calibration_dir_for_weights(str(bare))
    assert resolve_threshold("auto", d) == pytest.approx(0.5)


def test_save_load_round_trip(tmp_path):
    cal = {"threshold": 0.71, "f1": 0.88, "precision": 0.9,
           "recall": 0.86, "iou_threshold": 0.5, "n_images": 16}
    save_calibration(str(tmp_path), cal)
    assert load_calibration(str(tmp_path)) == cal
    assert load_calibration(str(tmp_path / "missing")) is None


def test_resolve_input_norm(tmp_path):
    """Checkpoint metadata wins; the fallback is the reference's
    normalizing transform (every torch checkpoint trains behind it),
    with a caller-supplied default for synthetic-only contexts."""
    assert resolve_input_norm(None) == "imagenet"
    assert resolve_input_norm(str(tmp_path)) == "imagenet"
    assert resolve_input_norm(str(tmp_path), default="raw01") == "raw01"
    save_calibration(str(tmp_path), {"threshold": 0.5,
                                     "input_norm": "raw01"})
    assert resolve_input_norm(str(tmp_path)) == "raw01"
    # older calibration files predate the field -> default applies
    save_calibration(str(tmp_path), {"threshold": 0.5})
    assert resolve_input_norm(str(tmp_path)) == "imagenet"


def test_proposal_generator_input_norm_controls_preprocessing():
    """The serving-time canvas must match the checkpoint's training
    diet: 'raw01' feeds the [0,1] image as-is, 'imagenet' applies the
    torchvision normalization. The round-2/3 e2e collapse came from
    serving a raw01-trained checkpoint through the normalizing path."""
    from cvpce_tpu.data.transforms import normalize_imagenet
    from cvpce_tpu.pipeline.proposals import ProposalGenerator

    cfg = GLNConfig(canvas_h=32, canvas_w=32, max_nms_candidates=64,
                    detections_per_img=8, use_pallas_nms=False)
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    seen = {}

    def fake_infer(images, sizes):
        seen["canvas"] = np.asarray(images)[0]
        return {"boxes": np.zeros((1, 8, 4), np.float32),
                "scores": np.zeros((1, 8), np.float32),
                "valid": np.zeros((1, 8), bool),
                "gaussians": np.zeros((1, 8, 8), np.float32)}

    for norm, expect in (("raw01", img),
                         ("imagenet", normalize_imagenet(img))):
        gen = ProposalGenerator({}, cfg, input_norm=norm)
        gen._infer = fake_infer
        gen.detect(img)
        np.testing.assert_allclose(seen["canvas"], expect, atol=1e-5)

    with pytest.raises(ValueError):
        ProposalGenerator({}, cfg, input_norm="bogus")


class _TinyDetSet:
    """Four 8x8 images, two gt boxes each."""

    def __init__(self):
        self.boxes = np.asarray([[0, 0, 4, 4], [4, 4, 8, 8]], np.float32)

    def __len__(self):
        return 4

    def __getitem__(self, i):
        return {
            "image": np.zeros((8, 8, 3), np.float32),
            "boxes": self.boxes,
            "image_size": np.array([8, 8], np.int32),
            "scale": np.float32(1.0),
            "orig_boxes": self.boxes.copy(),
        }


def test_calibrate_picks_max_f1_point():
    """Fake detector: exact gt boxes at confidence 0.9 plus one false
    positive at 0.2 per image. Keeping everything gives precision 2/3;
    cutting at >0.2 gives F1 1.0, so the calibrated threshold must land
    in (0.2, 0.9] with perfect P/R there."""
    ds = _TinyDetSet()

    def infer_fn(variables, images, sizes):
        b = images.shape[0]
        boxes = np.tile(
            np.asarray([[0, 0, 4, 4], [4, 4, 8, 8], [0, 4, 4, 8]],
                       np.float32)[None], (b, 1, 1))
        scores = np.tile(np.asarray([0.9, 0.9, 0.2], np.float32)[None],
                         (b, 1))
        return {"boxes": boxes, "scores": scores,
                "valid": np.ones((b, 3), bool)}

    cal = calibrate_confidence({}, GLNConfig(canvas_h=8, canvas_w=8),
                               ds, batch_size=2, infer_fn=infer_fn,
                               input_norm="raw01")
    assert cal["input_norm"] == "raw01"
    assert 0.2 < cal["threshold"] <= 0.9
    assert cal["f1"] == pytest.approx(1.0)
    assert cal["precision"] == pytest.approx(1.0)
    assert cal["recall"] == pytest.approx(1.0)
    assert cal["n_images"] == 4


def test_calibrate_threshold_separates_noise():
    """With gt at 0.6 and dense junk at 0.55, max-F1 must sit between —
    i.e. the calibrated point actually discriminates, it isn't a fixed
    0.5 (the r2 e2e failure mode: precision 0.46 at the reference's
    hardcoded threshold)."""
    ds = _TinyDetSet()

    def infer_fn(variables, images, sizes):
        b = images.shape[0]
        junk = np.stack([np.asarray([0, 0, 2, 2], np.float32) + i
                         for i in range(4)])
        boxes = np.concatenate(
            [np.asarray([[0, 0, 4, 4], [4, 4, 8, 8]], np.float32), junk])
        scores = np.asarray([0.6, 0.6, 0.55, 0.55, 0.55, 0.55], np.float32)
        return {"boxes": np.tile(boxes[None], (b, 1, 1)),
                "scores": np.tile(scores[None], (b, 1)),
                "valid": np.ones((b, 6), bool)}

    cal = calibrate_confidence({}, GLNConfig(canvas_h=8, canvas_w=8),
                               ds, batch_size=4, infer_fn=infer_fn)
    assert 0.55 < cal["threshold"] <= 0.6 + 1e-6
    assert cal["f1"] == pytest.approx(1.0)
