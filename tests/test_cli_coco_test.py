"""End-to-end CLI test: `misc retinanet-coco-test` reports BOTH graders
(in-house reference metrics + the independent COCO-protocol referee) on a
synthetic COCO corpus through the actual command-line entry point."""
import json

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from cvpce_tpu.cli import cli


@pytest.mark.slow
def test_retinanet_coco_test_reports_both_protocols(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 1
    for img_id in (1, 2):
        arr = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        name = f"{img_id:04d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": img_id, "file_name": name,
                       "width": 64, "height": 64})
        for _ in range(3):
            x, y = rng.uniform(2, 40, 2)
            w, h = rng.uniform(8, 20, 2)
            annotations.append({"id": ann_id, "image_id": img_id,
                                "category_id": 1,
                                "bbox": [float(x), float(y),
                                         float(w), float(h)],
                                "iscrowd": 0, "area": float(w * h)})
            ann_id += 1
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "thing"}]}
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(coco))

    result = CliRunner().invoke(cli, [
        "misc", "retinanet-coco-test",
        "--imgs", str(img_dir),
        "--annotations", str(ann_path),
        "--canvas", "64", "64",
        "--limit", "2",
    ])
    assert result.exit_code == 0, result.output
    out = json.loads(result.output)
    assert "reference_protocol" in out and "coco_protocol" in out
    assert "0.5" in out["reference_protocol"]
    assert set(out["coco_protocol"]) >= {"ap", "ap50", "ap75", "ar",
                                         "per_area"}
    # random weights on noise: APs exist and are sane (likely ~0)
    assert 0.0 <= out["reference_protocol"]["0.5"]["ap"] <= 1.0
    ap50 = out["coco_protocol"]["ap50"]
    assert np.isnan(ap50) or 0.0 <= ap50 <= 1.0
