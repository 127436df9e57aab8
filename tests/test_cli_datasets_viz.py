"""Dataset-visualization CLI options added for reference parity:
`gp visualize` (combined overview, cvpce/cli/datasets/gp.py:125-173),
`gp visualize-test --store/--image`, `gp test-distribution --only`,
`sku110k visualize --flip/--model/--conf-thresh`."""
import csv

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from cvpce_tpu.cli import cli


@pytest.fixture
def gp_dirs(tmp_path):
    rng = np.random.default_rng(0)
    gal = tmp_path / "gal"
    for cat, name in [("Food/Bakery", "p1"), ("Food/Dairy", "p2")]:
        d = gal / cat
        d.mkdir(parents=True, exist_ok=True)
        arr = rng.uniform(0, 255, (64, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.jpg")
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    (ann_dir / "s1_2.csv").write_text(
        "Food/Bakery/p1.jpg, 10, 20, 50, 80\n"
        "Food/Dairy/p2.jpg, 60, 20, 90, 80\n")
    img_dir = tmp_path / "imgs"
    (img_dir / "store1" / "images").mkdir(parents=True)
    arr = rng.uniform(0, 255, (100, 120, 3)).astype(np.uint8)
    Image.fromarray(arr).save(img_dir / "store1" / "images" /
                              "store1_2.jpg")
    return str(gal), str(img_dir), str(ann_dir)


def test_gp_visualize_combined(gp_dirs, tmp_path):
    gal, img_dir, ann_dir = gp_dirs
    out = str(tmp_path / "overview.png")
    r = CliRunner().invoke(cli, [
        "datasets", "gp", "visualize", "--source", gal,
        "--test-imgs", img_dir, "--annotations", ann_dir,
        "--out", out], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert "saved" in r.output


def test_gp_visualize_test_by_store_image(gp_dirs, tmp_path):
    gal, img_dir, ann_dir = gp_dirs
    out = str(tmp_path / "t.png")
    r = CliRunner().invoke(cli, [
        "datasets", "gp", "visualize-test", "--imgs", img_dir,
        "--annotations", ann_dir, "--store", "1", "--image", "2",
        "--out", out], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    r = CliRunner().invoke(cli, [
        "datasets", "gp", "visualize-test", "--imgs", img_dir,
        "--annotations", ann_dir, "--store", "9", "--image", "9",
        "--out", out])
    assert r.exit_code != 0  # unknown store/image -> UsageError


def test_gp_test_distribution_only(gp_dirs):
    _, img_dir, ann_dir = gp_dirs
    runner = CliRunner()
    base = ["datasets", "gp", "test-distribution", "--imgs", img_dir,
            "--annotations", ann_dir]
    full = runner.invoke(cli, base, catch_exceptions=False).output
    assert "Food" in full and "     2  Food" in full
    # val split keeps the first 2 anns (both) - test split skips them
    val = runner.invoke(cli, base + ["--only", "val"],
                        catch_exceptions=False).output
    assert "     2  Food" in val
    test = runner.invoke(cli, base + ["--only", "test"],
                         catch_exceptions=False).output
    assert "Food" not in test


@pytest.fixture
def sku_dirs(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "sku"
    d.mkdir()
    ann = d / "ann.csv"
    with open(ann, "w", newline="") as f:
        w = csv.writer(f)
        name = "img_0.png"
        Image.fromarray((rng.uniform(0, 255, (64, 64, 3))
                         ).astype(np.uint8)).save(d / name)
        for _ in range(3):
            x1, y1 = rng.integers(0, 40, 2)
            bw, bh = rng.integers(8, 20, 2)
            w.writerow([name, x1, y1, x1 + bw, y1 + bh, "object", 64, 64])
    return str(d), str(ann)


def test_sku_visualize_flip(sku_dirs, tmp_path):
    imgs, ann = sku_dirs
    out = str(tmp_path / "s.png")
    r = CliRunner().invoke(cli, [
        "datasets", "sku110k", "visualize", "--imgs", imgs,
        "--annotations", ann, "--flip", "--gaussians", "--out", out],
        catch_exceptions=False)
    assert r.exit_code == 0, r.output


@pytest.mark.slow
def test_sku_visualize_model_overlay(sku_dirs, tmp_path):
    import jax

    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.checkpoint import CheckpointManager
    from cvpce_tpu.train.gln import GLNTrainConfig, init_train_state

    cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                    detections_per_img=64)
    state, _ = init_train_state(cfg, GLNTrainConfig(),
                                jax.random.PRNGKey(0))
    run = tmp_path / "run"
    CheckpointManager(str(run)).save_rotating(state, {"epoch": 0})

    imgs, ann = sku_dirs
    out = str(tmp_path / "det.png")
    r = CliRunner().invoke(cli, [
        "datasets", "sku110k", "visualize", "--imgs", imgs,
        "--annotations", ann, "--model", str(run / "checkpoint"),
        "--canvas", "64", "64", "--max-detections", "64",
        "--nms-candidates", "128", "--conf-thresh", "0.0", "--out", out],
        catch_exceptions=False)
    assert r.exit_code == 0, r.output
