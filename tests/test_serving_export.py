"""Params-only serving exports (pipeline/serving.py).

A serving export must (a) carry exactly the inference collections of
the training checkpoint it came from, (b) load identically through
load_gln_variables / load_dihe_encoder whether pointed at the full
training-run directory or at the export, and (c) carry the calibration
sidecar so threshold + input_norm travel with the weights
(pipeline/calibrate.py; the reference ships bare .tar weights and
hardcodes 0.5 — cvpce/production.py:14)."""
import json
import os

import jax
import numpy as np
import pytest
from flax import struct

from cvpce_tpu.models.gln import GLNConfig
from cvpce_tpu.pipeline.calibrate import (CALIBRATION_FILE,
                                          resolve_input_norm,
                                          resolve_threshold)
from cvpce_tpu.pipeline.serving import (export_dihe_serving,
                                        export_gln_serving,
                                        load_dihe_encoder,
                                        load_gln_variables,
                                        load_serving_meta)
from cvpce_tpu.train.checkpoint import CheckpointManager
from cvpce_tpu.train.gln import GLNTrainConfig, init_train_state


def _trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def gln_run(tmp_path_factory):
    run = str(tmp_path_factory.mktemp("gln_run"))
    cfg = GLNConfig(canvas_h=64, canvas_w=96, max_nms_candidates=64,
                    detections_per_img=16, use_pallas_nms=False)
    state, _ = init_train_state(
        cfg, GLNTrainConfig(lr=1e-3, match_chunk=256, min_negatives=8),
        jax.random.PRNGKey(0))
    CheckpointManager(run).save_rotating(state, {"epoch": 3, "ap": 0.5})
    with open(os.path.join(run, CALIBRATION_FILE), "w") as f:
        json.dump({"threshold": 0.62, "input_norm": "raw01"}, f)
    return run, state


def test_gln_export_round_trip(gln_run, tmp_path):
    run, state = gln_run
    out = str(tmp_path / "artifact")
    export_gln_serving(run, out)

    from_run = load_gln_variables(run)
    from_art = load_gln_variables(out)
    for collection in ("params", "frozen", "batch_stats"):
        _trees_equal(from_run[collection], from_art[collection])
    _trees_equal(from_art["params"], state.params)
    _trees_equal(from_art["frozen"], state.frozen)

    # calibration + meta travel with the artifact
    assert resolve_threshold("auto", out) == pytest.approx(0.62)
    assert resolve_input_norm(out, default="imagenet") == "raw01"
    assert load_serving_meta(out)["epoch"] == 3

    # the export must be a strict subset of the train state: inference
    # collections only, no optimizer moments / step / rng
    import orbax.checkpoint as ocp
    tree = ocp.StandardCheckpointer().restore(
        os.path.join(out, "serving_checkpoint"))
    assert sorted(tree) == ["batch_stats", "frozen", "params"]


def test_export_and_load_accept_relative_paths(gln_run, tmp_path,
                                               monkeypatch):
    """orbax rejects relative paths; serving.py must abspath them.
    (Regression: the r3 queue's `--run checkpoints/gln_r3` export died
    with 'Checkpoint path should be absolute'.)"""
    run, state = gln_run
    monkeypatch.chdir(tmp_path)
    os.symlink(run, "run_rel")
    export_gln_serving("run_rel", "artifact_rel")
    variables = load_gln_variables("artifact_rel")
    _trees_equal(variables["params"], state.params)


def test_cli_loader_accepts_artifact(gln_run, tmp_path):
    """`gln eval --load <artifact-dir>` path: cli.common.load_gln_variables
    must restore a serving export (and a run dir) template-free."""
    from cvpce_tpu.cli import common as cli_common

    run, state = gln_run
    out = str(tmp_path / "artifact")
    export_gln_serving(run, out)
    cfg = GLNConfig(canvas_h=64, canvas_w=96, max_nms_candidates=64,
                    detections_per_img=16, use_pallas_nms=False)
    for src in (out, run):
        variables = cli_common.load_gln_variables(src, cfg)
        _trees_equal(variables["params"], state.params)
        _trees_equal(variables["frozen"], state.frozen)


def test_cli_embedder_accepts_dihe_dir(tmp_path):
    """`--load-enc <dihe-dir>`: load_embedder must accept a DIHE run or
    serving export directory and serve the encoder BN-folded."""
    import jax.numpy as jnp

    from cvpce_tpu.cli.common import load_embedder
    from cvpce_tpu.models.embedders import MACVGG

    model = MACVGG(batch_norm=True, train=True)
    variables = model.init(jax.random.PRNGKey(3),
                           np.zeros((1, 64, 64, 3), np.float32))
    state = _FakeDIHEState(
        emb_params=jax.device_get(variables["params"]),
        emb_stats=jax.device_get(variables["batch_stats"]),
        gen_params={"g": np.ones(4, np.float32)},
        disc_params={"d": np.ones(5, np.float32)})
    run = str(tmp_path / "run")
    CheckpointManager(run, name="embedder_checkpoint").save_rotating(
        state, {"epoch": 2})
    out = str(tmp_path / "artifact")
    export_dihe_serving(run, out)

    fn_art, size = load_embedder(out, batch_norm=True)
    fn_run, _ = load_embedder(run, batch_norm=True)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)
                                         ).astype(np.float32)
    ea, er = np.asarray(fn_art(jnp.asarray(x))), \
        np.asarray(fn_run(jnp.asarray(x)))
    np.testing.assert_allclose(ea, er, rtol=0, atol=0)
    assert ea.shape == (2, size)
    assert np.isfinite(ea).all()


def test_gln_loader_rejects_non_gln(tmp_path):
    @struct.dataclass
    class NotGLN:
        emb_params: dict

    run = str(tmp_path / "run")
    CheckpointManager(run).save_rotating(
        NotGLN(emb_params={"w": np.ones(2, np.float32)}), {})
    with pytest.raises(ValueError, match="not a GLN checkpoint"):
        load_gln_variables(run)


@struct.dataclass
class _FakeDIHEState:
    """Field-name contract of train/dihe.py DIHEState — the loader keys
    off emb_params/emb_stats and must leave GAN + optimizer state
    behind."""
    emb_params: dict
    emb_stats: dict
    gen_params: dict
    disc_params: dict


def test_dihe_export_round_trip(tmp_path):
    run = str(tmp_path / "run")
    state = _FakeDIHEState(
        emb_params={"conv": np.arange(6, dtype=np.float32)},
        emb_stats={"bn": {"mean": np.zeros(3, np.float32)}},
        gen_params={"g": np.ones(4, np.float32)},
        disc_params={"d": np.ones(5, np.float32)})
    CheckpointManager(run, name="embedder_checkpoint").save_rotating(
        state, {"epoch": 7})

    out = str(tmp_path / "artifact")
    export_dihe_serving(run, out)

    p_run, s_run = load_dihe_encoder(run)
    p_art, s_art = load_dihe_encoder(out)
    _trees_equal(p_run, p_art)
    _trees_equal(s_run, s_art)
    _trees_equal(p_art, state.emb_params)
    assert load_serving_meta(out)["epoch"] == 7

    # GAN weights must NOT be in the artifact
    raw = load_serving_meta(out)  # meta only; check checkpoint keys via load
    import orbax.checkpoint as ocp
    tree = ocp.StandardCheckpointer().restore(
        os.path.join(out, "serving_checkpoint"))
    assert sorted(tree) == ["batch_stats", "params"]
