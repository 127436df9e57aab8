"""End-to-end CLI test: `misc pipeline-demo` on synthetic data with a tiny
canvas — the full detect -> classify -> compliance path through the actual
command-line entry point."""
import json

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from cvpce_tpu.cli import cli


@pytest.mark.slow
def test_pipeline_demo_synthetic(tmp_path):
    rng = np.random.default_rng(0)

    gallery = tmp_path / "gallery"
    gallery.mkdir()
    for name in ("prodA", "prodB"):
        arr = (rng.uniform(0, 255, (48, 48, 3))).astype(np.uint8)
        Image.fromarray(arr).save(gallery / f"{name}.png")

    shelf = (rng.uniform(0, 255, (96, 96, 3))).astype(np.uint8)
    img_path = tmp_path / "shelf.jpg"
    Image.fromarray(shelf).save(img_path)

    plano = [
        {"label": "prodA", "box": [5, 5, 40, 60]},
        {"label": "prodB", "box": [45, 5, 80, 60]},
    ]
    plano_path = tmp_path / "plano.json"
    plano_path.write_text(json.dumps(plano))

    result = CliRunner().invoke(cli, [
        "misc", "pipeline-demo", str(img_path),
        "--gallery", str(gallery),
        "--planogram", str(plano_path),
        "--confidence", "0.0",      # random weights: accept anything
        "--canvas", "64", "64",
    ])
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert 0.0 <= out["compliance"] <= 1.0

    # serving-side color correction path (classify crops from the
    # corrected scene; detection input stays raw)
    result = CliRunner().invoke(cli, [
        "misc", "pipeline-demo", str(img_path),
        "--gallery", str(gallery),
        "--planogram", str(plano_path),
        "--confidence", "0.0",
        "--canvas", "64", "64",
        "--color-correct",
    ])
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert 0.0 <= out["compliance"] <= 1.0
