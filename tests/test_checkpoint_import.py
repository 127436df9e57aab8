"""Checkpoint tests: GLN torch-layout import + orbax roundtrip + rotation."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvpce_tpu.models.gln import GLN, GLNConfig  # noqa: E402
from cvpce_tpu.utils import torch_import as ti  # noqa: E402
from tests.test_model_parity import (  # noqa: E402
    _rand_bn, _rand_conv, make_resnet50_state_dict)

CFG = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                detections_per_img=64)


def make_gln_state_dict(rng):
    """Synthetic reference-layout GLN checkpoint
    (GaussianLayerNetwork.state_dict() keys, models/proposals.py:162-203)."""
    sd = {}
    body = make_resnet50_state_dict(rng)
    for k, v in body.items():
        sd[f"backbone.body.{k}"] = v

    def conv_wb(prefix, cout, cin, k):
        sd[f"{prefix}.weight"] = _rand_conv(rng, cout, cin, k)
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.normal(0, 0.02, cout).astype(np.float32))

    for i, cin in enumerate((512, 1024, 2048)):
        conv_wb(f"backbone.fpn.inner_blocks.{i}", 256, cin, 1)
        conv_wb(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3)
    conv_wb("backbone.fpn.extra_blocks.p6", 256, 256, 3)
    conv_wb("backbone.fpn.extra_blocks.p7", 256, 256, 3)

    conv_wb("backbone.gaussian_layer.lateral", 256, 256, 1)
    conv_wb("backbone.gaussian_layer.block1.conv", 128, 256, 3)
    _rand_bn(rng, sd, "backbone.gaussian_layer.block1.norm", 128)
    conv_wb("backbone.gaussian_layer.block2.conv", 64, 128, 3)
    _rand_bn(rng, sd, "backbone.gaussian_layer.block2.norm", 64)
    for i, (cin, cout, k) in enumerate(
        [(64, 32, 3), (32, 32, 3), (32, 16, 3), (16, 16, 1), (16, 1, 1)]
    ):
        conv_wb(f"backbone.gaussian_subnet.blocks.{i}.conv", cout, cin, k)

    for head, final in (("classification_head", "cls_logits"),
                        ("regression_head", "bbox_reg")):
        for i in range(4):
            conv_wb(f"head.{head}.conv.{2 * i}", 256, 256, 3)
        out_ch = 9 if final == "cls_logits" else 36
        conv_wb(f"head.{head}.{final}", out_ch, 256, 3)
    return sd


class TestGLNImport:
    def test_import_covers_every_model_param(self):
        rng = np.random.default_rng(0)
        sd = make_gln_state_dict(rng)
        imported = ti.import_gln(sd)

        model = GLN(config=CFG, train=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))

        def paths(tree, prefix=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    yield from paths(v, prefix + (k,))
                else:
                    yield prefix + (k,), np.shape(v)

        want = dict(paths(variables["params"]))
        got = dict(paths(imported["params"]))
        missing = set(want) - set(got)
        extra = set(got) - set(want)
        assert not missing, f"unimported params: {sorted(missing)[:8]}"
        assert not extra, f"unexpected params: {sorted(extra)[:8]}"
        for p in want:
            assert want[p] == got[p], (p, want[p], got[p])
        # frozen + batch_stats collections line up too
        want_f = dict(paths(variables["frozen"]))
        got_f = dict(paths(imported["frozen"]))
        assert set(want_f) == set(got_f)
        want_b = dict(paths(variables["batch_stats"]))
        got_b = dict(paths(imported["batch_stats"]))
        assert set(want_b) == set(got_b)

    def test_imported_model_runs(self):
        rng = np.random.default_rng(1)
        sd = make_gln_state_dict(rng)
        imported = ti.import_gln(sd)
        model = GLN(config=CFG, train=False)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        out = model.apply(
            {"params": imported["params"], "frozen": imported["frozen"],
             "batch_stats": imported["batch_stats"]}, x)
        assert np.isfinite(np.asarray(out["cls_logits"])).all()
        assert np.isfinite(np.asarray(out["gaussians"])).all()


class TestOrbaxRoundtrip:
    def test_rotating_save_restore(self, tmp_path):
        from cvpce_tpu.train.checkpoint import CheckpointManager

        state = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                 "step": np.int32(7)}
        mgr = CheckpointManager(str(tmp_path))
        mgr.save_rotating(state, {"epoch": 0, "iteration": 100})
        # second save rotates the first to previous_checkpoint
        state2 = {"w": state["w"] * 2, "step": np.int32(8)}
        mgr.save_rotating(state2, {"epoch": 1, "iteration": 200})

        restored = mgr.restore(state)
        np.testing.assert_array_equal(restored["w"], state2["w"])
        assert mgr.load_meta()["iteration"] == 200
        prev = mgr.restore(state, name="previous_checkpoint")
        np.testing.assert_array_equal(prev["w"], state["w"])

    def test_best_keeper(self, tmp_path):
        from cvpce_tpu.train.checkpoint import BestKeeper, CheckpointManager

        mgr = CheckpointManager(str(tmp_path))
        keeper = BestKeeper(mgr, "ap")
        s = {"w": np.zeros(3, np.float32)}
        assert keeper.update(s, 0, 0.5)
        assert not keeper.update(s, 1, 0.4)       # no improvement, no save
        assert keeper.update(s, 2, 0.6)
        assert keeper.best == {"epoch": 2, "ap": 0.6}
        import os
        names = set(os.listdir(tmp_path))
        assert "epoch_0" in names and "epoch_2" in names
        assert "epoch_1" not in names


class TestEmbedderCheckpointImport:
    def test_reference_macvgg_layout(self, tmp_path):
        """block1./block2. Sequential-slice checkpoints must remap onto
        torchvision feature indices (block2 offset +33 with BN)."""
        from tests.test_model_parity import make_vgg16bn_state_dict
        from cvpce_tpu.cli.common import load_embedder

        rng = np.random.default_rng(0)
        full = make_vgg16bn_state_dict(rng)
        # build the sliced layout the reference saves
        # (classification.py:36-37): block1 = features[:33],
        # block2 = features[33:43], indices renumbered from 0
        sliced = {}
        for k, v in full.items():
            idx = int(k.split(".")[1])
            tail = k.split(".", 2)[2]
            if idx < 33:
                sliced[f"block1.{idx}.{tail}"] = v
            elif idx < 43:
                sliced[f"block2.{idx - 33}.{tail}"] = v
        ckpt = tmp_path / "embedder.tar"
        torch.save({"model_state_dict": sliced}, str(ckpt))

        encode_sliced, _ = load_embedder(str(ckpt))

        full_ckpt = tmp_path / "vgg.pth"
        torch.save(full, str(full_ckpt))
        encode_full, _ = load_embedder(str(full_ckpt))

        x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(encode_sliced(x)),
                                   np.asarray(encode_full(x)), atol=1e-5)


class TestOrbaxInferenceLoad:
    @pytest.mark.slow
    def test_load_gln_variables_from_orbax_dir(self, tmp_path):
        """Train-loop checkpoints feed straight into inference CLIs."""
        from cvpce_tpu.cli.common import load_gln_variables
        from cvpce_tpu.train.checkpoint import CheckpointManager
        from cvpce_tpu.train.gln import GLNTrainConfig, init_train_state

        state, _ = init_train_state(CFG, GLNTrainConfig(),
                                    jax.random.PRNGKey(7))
        mgr = CheckpointManager(str(tmp_path), name="checkpoint")
        mgr.save_rotating(state, {"epoch": 0, "iteration": 0})

        variables = load_gln_variables(
            str(tmp_path / "checkpoint"), CFG)
        leaf_saved = np.asarray(state.params["head"]["cls_logits"]["bias"])
        leaf_got = np.asarray(
            variables["params"]["head"]["cls_logits"]["bias"])
        np.testing.assert_array_equal(leaf_got, leaf_saved)
        assert "frozen" in variables and "batch_stats" in variables
