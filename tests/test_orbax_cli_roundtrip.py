"""Orbax train -> save -> `gln eval` CLI reload round trip (VERDICT r1 #10).

Trains a tiny GLN on an on-disk SKU110K-format synthetic dataset, then
evaluates twice: once in-process with the final in-memory train state, and
once through the real `gln eval` click command pointed at the orbax
checkpoint directory the loop saved. The two metric sets must agree — the
reference's equivalent guarantee is torch.save/load of the same state_dict
feeding proposals_eval (cvpce/proposals_training.py:103-139 +
cvpce/cli/gln.py:230-280).
"""
import csv
import json
import os

import numpy as np
import pytest

CANVAS = 64


def _write_dataset(root, n=3, seed=0):
    os.makedirs(root, exist_ok=True)
    from PIL import Image

    rng = np.random.default_rng(seed)
    ann = os.path.join(root, "annotations.csv")
    with open(ann, "w", newline="") as f:
        writer = csv.writer(f)
        for i in range(n):
            name = f"img_{i}.png"
            img = (rng.uniform(0, 1, (CANVAS, CANVAS, 3)) * 255).astype(
                np.uint8)
            Image.fromarray(img).save(os.path.join(root, name))
            for _ in range(int(rng.integers(2, 5))):
                x1, y1 = rng.integers(0, CANVAS - 24, 2)
                w, h = rng.integers(8, 20, 2)
                writer.writerow([name, x1, y1, x1 + w, y1 + h, "object",
                                 CANVAS, CANVAS])
    return root, ann


@pytest.mark.slow
def test_train_orbax_save_cli_eval_roundtrip(tmp_path):
    from click.testing import CliRunner

    from cvpce_tpu.cli.gln import gln
    from cvpce_tpu.data.sku110k import SKU110KDataset
    from cvpce_tpu.eval.proposals import evaluate_gln
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import GLNTrainConfig
    from cvpce_tpu.train.loops import train_proposal_generator

    data_dir, ann_file = _write_dataset(str(tmp_path / "data"))
    out = str(tmp_path / "run")

    model_cfg = GLNConfig(canvas_h=CANVAS, canvas_w=CANVAS,
                          max_nms_candidates=128, detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    trainset = SKU110KDataset(data_dir, ann_file, flip_chance=0.5,
                              canvas_h=CANVAS, canvas_w=CANVAS)
    evalset = SKU110KDataset(data_dir, ann_file, flip_chance=0.0,
                             canvas_h=CANVAS, canvas_w=CANVAS)

    result = train_proposal_generator(
        trainset, evalset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=2, eval_interval=1,
        eval_threshold=0.5, use_mesh=False)

    # the final epoch is always retained as epoch_<e> (BestKeeper)
    ckpt_dir = os.path.join(out, "epoch_0")
    assert os.path.isdir(ckpt_dir)

    state = result["state"]
    in_memory = evaluate_gln(
        {"params": state.params, "frozen": state.frozen,
         "batch_stats": state.batch_stats},
        evalset, model_cfg, thresholds=(0.5,), batch_size=2)[0.5]

    metrics_json = str(tmp_path / "cli_metrics.json")
    runner = CliRunner()
    res = runner.invoke(gln, [
        "eval", "--weights", ckpt_dir, "--imgs", data_dir,
        "--annotations", ann_file, "--canvas", str(CANVAS), str(CANVAS),
        "--max-detections", "64", "--nms-candidates", "128",
        "--batch-size", "2", "--out", metrics_json,
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    with open(metrics_json) as f:
        cli = json.load(f)["0.5"]

    for key in ("ap", "ar_300", "f", "p", "r"):
        assert cli[key] == pytest.approx(float(in_memory[key]), abs=1e-6), (
            key, cli, {k: float(v) for k, v in in_memory.items()
                       if k != "raw"})
