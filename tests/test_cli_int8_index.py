"""End-to-end CLI test of the int8 serving plumbing (NEXT.md item 8):
`dihe prebuild-index --int8` must calibrate static activation scales on
the gallery and persist them in the saved index; `dihe eval --int8
--index` must restore those scales and classify through the real CLI
entry points (reference flow: cvpce/cli/dihe.py:257-309 + 382-423)."""
import json

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from cvpce_tpu.cli import cli


@pytest.fixture
def gp_fixture(tmp_path):
    rng = np.random.default_rng(3)
    gal = tmp_path / "gal"
    for cat, name in [("Food/Bakery", "p1"), ("Food/Dairy", "p2")]:
        d = gal / cat
        d.mkdir(parents=True, exist_ok=True)
        arr = rng.uniform(0, 255, (64, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.jpg")

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    (ann_dir / "s1_1.csv").write_text(
        "Food/Bakery/p1.jpg, 5, 5, 45, 60\n"
        "Food/Dairy/p2.jpg, 50, 5, 90, 60\n")
    img_dir = tmp_path / "imgs"
    (img_dir / "store1" / "images").mkdir(parents=True)
    shelf = rng.uniform(0, 255, (80, 100, 3)).astype(np.uint8)
    Image.fromarray(shelf).save(
        img_dir / "store1" / "images" / "store1_1.jpg")
    return gal, img_dir, ann_dir


@pytest.mark.slow
def test_prebuild_index_int8_then_eval(gp_fixture, tmp_path):
    gal, img_dir, ann_dir = gp_fixture
    idx = tmp_path / "index.npz"

    r = CliRunner().invoke(cli, [
        "dihe", "prebuild-index", "--source", str(gal),
        "--out", str(idx), "--batch-size", "2", "--int8"])
    assert r.exit_code == 0, r.output
    assert "2 entries" in r.output

    data = np.load(idx, allow_pickle=True)
    assert "act_scales" in data.files, \
        "int8 static scales must persist with the index"
    scales = data["act_scales"][0]
    assert all(s > 0 for s in np.asarray(
        [float(v) for v in _leaves(scales)]))

    # --validation keeps the first 2 annotations per image
    # (defaults.GP_TEST_VALIDATION_SET_SIZE) — exactly this fixture's 2
    r = CliRunner().invoke(cli, [
        "dihe", "eval", "--index", str(idx), "--int8", "--validation",
        "--test-imgs", str(img_dir), "--test-annotations", str(ann_dir),
        "--batch-size", "2", "--k", "1"])
    assert r.exit_code == 0, r.output
    acc = json.loads(r.output.strip().splitlines()[-1])
    assert set(acc) == {"1"}
    assert 0.0 <= acc["1"] <= 1.0

    # int8 scales + gallery sharding compose: restored static scales
    # embed the queries, the sharded search must match the single-device
    # accuracy exactly (merge is bit-identical)
    r2 = CliRunner().invoke(cli, [
        "dihe", "eval", "--index", str(idx), "--int8", "--validation",
        "--sharded-gallery",
        "--test-imgs", str(img_dir), "--test-annotations", str(ann_dir),
        "--batch-size", "2", "--k", "1"])
    assert r2.exit_code == 0, r2.output
    acc2 = json.loads(r2.output.strip().splitlines()[-1])
    assert acc2 == acc


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree
