"""Loop-level training tests: full orchestration on synthetic data
(loader -> jitted step -> rotating checkpoints -> eval -> best-keeper)."""
import json
import os

import numpy as np
import pytest

from cvpce_tpu.models.gln import GLNConfig
from cvpce_tpu.train.gln import GLNTrainConfig


class _SyntheticDetectionSet:
    """Items shaped like data.sku110k.SKU110KDataset output."""

    def __init__(self, n=3, canvas=64):
        self.n = n
        self.canvas = canvas
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(n):
            img = rng.uniform(0, 1, (canvas, canvas, 3)).astype(np.float32)
            nb = int(rng.integers(2, 5))
            xy = rng.uniform(0, canvas - 20, (nb, 2)).astype(np.float32)
            wh = rng.uniform(8, 18, (nb, 2)).astype(np.float32)
            self.items.append({
                "image": img,
                "boxes": np.concatenate([xy, xy + wh], -1),
                "image_size": np.array([canvas, canvas], np.int32),
                "scale": np.float32(1.0),
                "orig_boxes": np.concatenate([xy, xy + wh], -1),
            })

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


@pytest.mark.slow
def test_gln_training_loop_end_to_end(tmp_path):
    from cvpce_tpu.train.loops import train_proposal_generator

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    dataset = _SyntheticDetectionSet()
    out = str(tmp_path / "run")

    result = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=2, eval_interval=1,
        eval_threshold=0.5, use_mesh=False,
    )
    assert np.isfinite(
        float(np.asarray(result["state"].step)))
    files = set(os.listdir(out))
    assert "checkpoint" in files        # rotating checkpoint
    assert "stats_0.json" in files      # per-epoch loss dump
    with open(os.path.join(out, "stats_0.json")) as f:
        stats = json.load(f)
    assert len(stats["class_loss"]) == 3
    # epoch eval ran and the keeper recorded it (random net: ap >= 0)
    assert "epoch" in result["best"]


@pytest.mark.slow
def test_gln_loop_warm_start_from_serving_export(tmp_path):
    """load_orbax warm-starts params/frozen/batch_stats from a serving
    export (fresh optimizer) — the fine-tune path behind
    `train_convergence.py --init-from` and `gln train --load <dir>`."""
    import jax

    from cvpce_tpu.pipeline.serving import export_gln_serving
    from cvpce_tpu.train.checkpoint import CheckpointManager
    from cvpce_tpu.train.gln import init_train_state
    from cvpce_tpu.train.loops import train_proposal_generator

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    # build a recognizable source state and export it for serving
    state, _ = init_train_state(model_cfg, train_cfg,
                                jax.random.PRNGKey(42))
    src_dir = str(tmp_path / "src_run")
    CheckpointManager(src_dir).save_rotating(state, {"iteration": 0})
    export_dir = str(tmp_path / "export")
    export_gln_serving(src_dir, export_dir)

    dataset = _SyntheticDetectionSet()
    out = str(tmp_path / "ft_run")
    result = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=100, eval_interval=1,
        eval_threshold=0.5, use_mesh=False, load_orbax=export_dir,
    )
    # adoption check: after 3 small SGD steps the result must sit close
    # to the EXPORT's params and far from what a fresh seed-0 init (the
    # loop's default) would have been — frozen-BN constants are
    # seed-independent, so params carry the evidence
    fresh, _ = init_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))

    def dist(a, b):
        return float(sum(
            np.linalg.norm(np.asarray(x) - np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))))

    d_export = dist(result["state"].params, state.params)
    d_fresh = dist(result["state"].params, fresh.params)
    assert d_export < 0.1 * d_fresh, (d_export, d_fresh)
    # and training actually stepped from it
    assert float(np.asarray(result["state"].step)) == 3


@pytest.mark.slow
def test_gln_loop_resume(tmp_path):
    from cvpce_tpu.train.loops import train_proposal_generator

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    dataset = _SyntheticDetectionSet()
    out = str(tmp_path / "run")

    r1 = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=1, eval_interval=5,
        use_mesh=False)
    step1 = int(np.asarray(r1["state"].step))
    r2 = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=1, eval_interval=5,
        use_mesh=False, resume=True)
    step2 = int(np.asarray(r2["state"].step))
    assert step2 > step1  # continued from the restored state


class _SyntheticGallerySet:
    """(emb_img, gen_img, hierarchy, annotation) tuples at 64px for the
    GAN/DIHE loops (gen_downs=4)."""

    def __init__(self, n=8, size=64):
        rng = np.random.default_rng(1)
        self.items = []
        for i in range(n):
            img = rng.uniform(-1, 1, (size, size, 3)).astype(np.float32)
            crop = rng.uniform(-1, 1, (size, size, 3)).astype(np.float32)
            hier = ["Food", f"Cat{i % 2}", f"Sub{i % 4}"]
            self.items.append((img, crop, hier, f"p{i}"))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _SyntheticCropSet:
    def __init__(self, n=8, size=64):
        rng = np.random.default_rng(2)
        self.crops = rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32)

    def __len__(self):
        return len(self.crops)

    def __getitem__(self, i):
        return self.crops[i]


@pytest.mark.slow
def test_dihe_training_loop_one_epoch(tmp_path, monkeypatch):
    from cvpce_tpu.train.dihe import DIHETrainConfig
    from cvpce_tpu.train import loops

    # keep the epoch-end eval synthetic: patch eval_dihe used inside
    monkeypatch.setattr(
        "cvpce_tpu.eval.classification.eval_dihe",
        lambda *a, **k: {1: 0.5})

    dataset = _SyntheticGallerySet()
    discset = _SyntheticCropSet()
    cfg = DIHETrainConfig(gen_downs=4)
    out = str(tmp_path / "dihe")
    result = loops.train_dihe(
        dataset, discset, dataset, None, out, epochs=1, batch_size=2,
        checkpoint_interval=100, train_cfg=cfg, use_mesh=False)
    assert "best" in result
    state = result["state"]
    assert np.isfinite(float(np.asarray(state.step)))
    assert int(np.asarray(state.step)) == 2  # 8 items / (2*batch_size)


@pytest.mark.slow
def test_multi_step_scan_matches_sequential(tmp_path):
    """make_multi_step(k) must be step-for-step identical to k sequential
    calls of the underlying step (same losses, same final params)."""
    import jax
    import jax.numpy as jnp

    from cvpce_tpu.train import gln as gln_train

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64,
                               steps_per_epoch=4)
    anchors, _ = model_cfg.anchors()
    state0, optimizer = gln_train.init_train_state(
        model_cfg, train_cfg, jax.random.PRNGKey(0))
    step = gln_train.make_train_step(model_cfg, train_cfg, anchors,
                                     optimizer)

    k, b, t = 3, 1, 6
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (k, b, 64, 64, 3)).astype(np.float32)
    boxes = np.zeros((k, b, t, 4), np.float32)
    boxes[..., 2:] = 16.0
    boxes[..., 1:, :2] = rng.uniform(0, 40, (k, b, t - 1, 2))
    boxes[..., 2:4] += boxes[..., 0:2]
    valid = np.ones((k, b, t), bool)
    sizes = np.full((k, b, 2), 64, np.int32)

    seq_state = state0
    seq_losses = []
    jit_step = jax.jit(step)
    for s in range(k):
        seq_state, m = jit_step(seq_state, images[s], boxes[s], valid[s],
                                sizes[s])
        seq_losses.append(float(m["total"]))

    multi = jax.jit(gln_train.make_multi_step(step))
    scan_state, metrics = multi(state0, jnp.asarray(images),
                                jnp.asarray(boxes), jnp.asarray(valid),
                                jnp.asarray(sizes))
    scan_losses = np.asarray(metrics["total"])

    np.testing.assert_allclose(scan_losses, seq_losses, rtol=1e-5)
    # params match to f32 summation-order noise: XLA fuses the scan body
    # differently than the standalone step, so near-zero updated weights
    # can differ by a few ULPs of the update magnitude
    for pa, pb in zip(jax.tree.leaves(seq_state.params),
                      jax.tree.leaves(scan_state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)
    assert int(np.asarray(scan_state.step)) == k


@pytest.mark.slow
def test_loop_steps_per_call_chunked(tmp_path):
    """The loop with steps_per_call>1 logs per-step losses and still
    writes checkpoints/stats (remainder chunks included: 3 items, k=2)."""
    from cvpce_tpu.train.loops import train_proposal_generator

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    dataset = _SyntheticDetectionSet()
    out = str(tmp_path / "run")

    result = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=2, eval_interval=1,
        eval_threshold=0.5, use_mesh=False, steps_per_call=2)
    assert int(np.asarray(result["state"].step)) == 3
    with open(os.path.join(out, "stats_0.json")) as f:
        stats = json.load(f)
    assert len(stats["class_loss"]) == 3  # per-step logging preserved
    assert "checkpoint" in set(os.listdir(out))


@pytest.mark.slow
def test_gln_resume_continues_from_epoch_boundary(tmp_path):
    """With a LARGE checkpoint_interval, resume must still continue from
    the end-of-epoch state (hyperopt re-invokes the loop per epoch; the
    rotating checkpoint is saved at every epoch boundary)."""
    from cvpce_tpu.train.loops import train_proposal_generator

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    dataset = _SyntheticDetectionSet()
    out = str(tmp_path / "run")

    r1 = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=100, eval_interval=5,
        use_mesh=False)
    assert int(np.asarray(r1["state"].step)) == 3
    r2 = train_proposal_generator(
        dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
        batch_size=1, epochs=1, checkpoint_interval=100, eval_interval=5,
        use_mesh=False, resume=True)
    # all 3 steps of epoch 0 were retained, then 3 more ran
    assert int(np.asarray(r2["state"].step)) == 6


@pytest.mark.slow
def test_dihe_resume_continues(tmp_path, monkeypatch):
    from cvpce_tpu.train.dihe import DIHETrainConfig
    from cvpce_tpu.train import loops

    monkeypatch.setattr(
        "cvpce_tpu.eval.classification.eval_dihe",
        lambda *a, **k: {1: 0.5})
    dataset = _SyntheticGallerySet()
    discset = _SyntheticCropSet()
    cfg = DIHETrainConfig(gen_downs=4)
    out = str(tmp_path / "dihe")
    r1 = loops.train_dihe(dataset, discset, dataset, None, out, epochs=1,
                          batch_size=2, checkpoint_interval=100,
                          train_cfg=cfg, use_mesh=False)
    assert int(np.asarray(r1["state"].step)) == 2
    r2 = loops.train_dihe(dataset, discset, dataset, None, out, epochs=1,
                          batch_size=2, checkpoint_interval=100,
                          train_cfg=cfg, use_mesh=False, resume=True)
    assert int(np.asarray(r2["state"].step)) == 4


def _tree_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


@pytest.mark.slow
def test_gan_pretrain_resume_bit_identical(tmp_path):
    """pretrain_gan(resume=True) must continue the interrupted run
    exactly: 1 epoch + resumed 1 epoch == 2 straight epochs, bit for
    bit (params, BN stats and Adam state of both players). Requires the
    (seed, epoch, step)-derived discriminator sample stream."""
    from cvpce_tpu.train.dihe import GANPretrainConfig
    from cvpce_tpu.train.loops import pretrain_gan

    dataset = _SyntheticGallerySet()
    discset = _SyntheticCropSet()
    cfg = GANPretrainConfig(gen_downs=4)

    straight = pretrain_gan(dataset, discset, str(tmp_path / "a"),
                            epochs=2, batch_size=2, train_cfg=cfg,
                            checkpoint_interval=100)["state"]

    out_b = str(tmp_path / "b")
    pretrain_gan(dataset, discset, out_b, epochs=1, batch_size=2,
                 train_cfg=cfg, checkpoint_interval=100)
    resumed = pretrain_gan(dataset, discset, out_b, epochs=1,
                           batch_size=2, train_cfg=cfg,
                           checkpoint_interval=100,
                           resume=True)["state"]

    for key in ("gen_params", "gen_stats", "disc_params", "disc_stats",
                "gen_opt", "disc_opt"):
        assert _tree_equal(straight[key], resumed[key]), key


@pytest.mark.slow
def test_dihe_resume_bit_identical(tmp_path, monkeypatch):
    """train_dihe resume: 1+1 epochs == 2 straight epochs bit for bit
    across all three players (same data order via the seeded loader,
    same discriminator draws via the derived rng)."""
    import jax

    from cvpce_tpu.train.dihe import DIHETrainConfig
    from cvpce_tpu.train import loops

    monkeypatch.setattr(
        "cvpce_tpu.eval.classification.eval_dihe",
        lambda *a, **k: {1: 0.5})
    dataset = _SyntheticGallerySet()
    discset = _SyntheticCropSet()
    cfg = DIHETrainConfig(gen_downs=4)

    straight = loops.train_dihe(
        dataset, discset, dataset, None, str(tmp_path / "a"), epochs=2,
        batch_size=2, checkpoint_interval=100, train_cfg=cfg,
        use_mesh=False)["state"]

    out_b = str(tmp_path / "b")
    loops.train_dihe(dataset, discset, dataset, None, out_b, epochs=1,
                     batch_size=2, checkpoint_interval=100,
                     train_cfg=cfg, use_mesh=False)
    resumed = loops.train_dihe(dataset, discset, dataset, None, out_b,
                               epochs=1, batch_size=2,
                               checkpoint_interval=100, train_cfg=cfg,
                               use_mesh=False, resume=True)["state"]

    assert _tree_equal(
        jax.tree_util.tree_leaves(straight),
        jax.tree_util.tree_leaves(resumed))
