"""End-to-end CLI tests for `eval-planograms --internal` and
`plot-planogram-eval --internal` (cvpce/cli/eval.py:160-371 with
--datatype internal): tiny random GLN served from an orbax checkpoint
through the real click entry points, internal planoset fixture with
ground-truth accuracy = correct/facings."""
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

CANVAS = 64


@pytest.fixture
def internal_fixture(tmp_path):
    import jax

    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.checkpoint import CheckpointManager
    from cvpce_tpu.train.gln import GLNTrainConfig, init_train_state

    rng = np.random.default_rng(7)

    # tiny GLN orbax checkpoint (random weights)
    cfg = GLNConfig(canvas_h=CANVAS, canvas_w=CANVAS,
                    max_nms_candidates=128, detections_per_img=64)
    state, _ = init_train_state(cfg, GLNTrainConfig(),
                                jax.random.PRNGKey(0))
    run = tmp_path / "run"
    CheckpointManager(str(run)).save_rotating(state, {"epoch": 0})

    # 2-product gallery
    gal = tmp_path / "gal"
    for name in ("p0", "p1"):
        d = gal / "Food"
        d.mkdir(parents=True, exist_ok=True)
        arr = (rng.uniform(0, 255, (48, 40, 3))).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.jpg")

    # internal planoset: index.json + planogram json + shelf image
    plano_root = tmp_path / "planos"
    plano_root.mkdir()
    shelf = (rng.uniform(0, 255, (80, 96, 3))).astype(np.uint8)
    Image.fromarray(shelf).save(plano_root / "shelf.jpg")
    plano = [{"code": "p0", "box": [5, 5, 40, 60]},
             {"code": "p1", "box": [50, 5, 90, 60]}]
    (plano_root / "plano.json").write_text(json.dumps(plano))
    (plano_root / "index.json").write_text(json.dumps([{
        "image": "shelf.jpg", "planogram": "plano.json",
        "correct": 1, "facings": 2}]))
    return str(run / "checkpoint"), str(gal), str(plano_root)


def _base_args(ckpt, gal):
    return ["--gln-weights", ckpt, "--source", gal,
            "--canvas", str(CANVAS), str(CANVAS),
            "--max-detections", "64", "--nms-candidates", "128",
            "--confidence", "0.0"]


@pytest.mark.slow
def test_eval_planograms_internal(internal_fixture):
    from cvpce_tpu.cli import cli

    ckpt, gal, planos = internal_fixture
    r = CliRunner().invoke(cli, ["eval-planograms"]
                           + _base_args(ckpt, gal)
                           + ["--internal", planos, "--verbose"],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    payload = json.loads(r.output[r.output.index("{"):])
    assert set(payload) >= {"mean_accuracy", "mse", "per_image"}
    assert 0.0 <= payload["mean_accuracy"] <= 1.0
    assert len(payload["per_image"]) == 1


@pytest.mark.slow
def test_eval_planograms_auto_confidence(internal_fixture):
    """Default --confidence auto picks up the max-F1 calibration
    persisted at the run-dir level (pipeline/calibrate.py) even when
    --gln-weights points at the rotating `checkpoint` subdir."""
    from cvpce_tpu.cli import cli
    from cvpce_tpu.pipeline.calibrate import save_calibration

    ckpt, gal, planos = internal_fixture
    save_calibration(os.path.dirname(ckpt), {"threshold": 0.0, "f1": 1.0})
    args = [a for a in _base_args(ckpt, gal) if a not in ("--confidence",
                                                          "0.0")]
    r = CliRunner().invoke(cli, ["eval-planograms"] + args
                           + ["--internal", planos],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert "serving confidence threshold: 0.0000 (calibrated)" in r.output
    payload = json.loads(r.output[r.output.index("{"):])
    assert 0.0 <= payload["mean_accuracy"] <= 1.0


@pytest.mark.slow
def test_plot_planogram_eval_internal(internal_fixture, tmp_path):
    from cvpce_tpu.cli import cli

    ckpt, gal, planos = internal_fixture
    out = str(tmp_path / "viz.png")
    r = CliRunner().invoke(cli, ["plot-planogram-eval"]
                           + _base_args(ckpt, gal)
                           + ["--internal", planos, "--plano-idx", "0",
                              "--out", out],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert os.path.exists(out)
