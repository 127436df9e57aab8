"""Data-parallel mesh test + end-to-end pipeline test with stub models."""
import jax
import numpy as np
import pytest

from cvpce_tpu.models.gln import GLNConfig
from cvpce_tpu.parallel import (
    data_parallel_mesh,
    make_dp_train_step,
    put_replicated,
)
from cvpce_tpu.train.gln import (
    GLNTrainConfig,
    init_train_state,
    make_train_step,
)


class TestDataParallel:
    @pytest.mark.slow
    def test_dp_step_matches_single_device(self):
        """The mesh step must compute the same update as single-device on
        the same global batch (all-reduce == concatenated mean)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device")
        model_cfg = GLNConfig(canvas_h=64, canvas_w=64,
                              max_nms_candidates=128, detections_per_img=64)
        train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64,
                                   steps_per_epoch=10)
        anchors, _ = model_cfg.anchors()

        rng = np.random.default_rng(0)
        b = 2
        images = rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32)
        boxes = np.zeros((b, 8, 4), np.float32)
        boxes[:, :, 2:] = 16.0
        valid = np.ones((b, 8), bool)
        sizes = np.full((b, 2), 64, np.int32)

        state, optimizer = init_train_state(model_cfg, train_cfg,
                                            jax.random.PRNGKey(0))
        step = make_train_step(model_cfg, train_cfg, anchors, optimizer)

        single_state, single_metrics = jax.jit(step)(
            state, images, boxes, valid, sizes)

        mesh = data_parallel_mesh(jax.devices()[:2])
        dp_step = make_dp_train_step(step, mesh, donate_state=False)
        state2, _ = init_train_state(model_cfg, train_cfg,
                                     jax.random.PRNGKey(0))
        state2 = put_replicated(state2, mesh)
        dp_state, dp_metrics = dp_step(state2, images, boxes, valid, sizes)

        assert float(dp_metrics["total"]) == pytest.approx(
            float(single_metrics["total"]), rel=1e-4)
        leaf_a = np.asarray(single_state.params["head"]["cls_logits"]["bias"])
        leaf_b = np.asarray(dp_state.params["head"]["cls_logits"]["bias"])
        np.testing.assert_allclose(leaf_a, leaf_b, atol=1e-5)


class TestDPStateResidency:
    @pytest.mark.slow
    def test_params_keep_sharding_across_steps(self):
        """The DP wrapper must not round-trip the state through the host:
        the output state of step k is directly consumable by step k+1 and
        stays replicated on the mesh throughout (VERDICT r1 #5)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device")
        from jax.sharding import NamedSharding, PartitionSpec as P

        model_cfg = GLNConfig(canvas_h=64, canvas_w=64,
                              max_nms_candidates=128, detections_per_img=64)
        train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64,
                                   steps_per_epoch=10)
        anchors, _ = model_cfg.anchors()
        rng = np.random.default_rng(0)
        b = 2
        images = rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32)
        boxes = np.zeros((b, 8, 4), np.float32)
        boxes[:, :, 2:] = 16.0
        valid = np.ones((b, 8), bool)
        sizes = np.full((b, 2), 64, np.int32)

        state, optimizer = init_train_state(model_cfg, train_cfg,
                                            jax.random.PRNGKey(0))
        step = make_train_step(model_cfg, train_cfg, anchors, optimizer)
        mesh = data_parallel_mesh(jax.devices()[:2])
        dp_step = make_dp_train_step(step, mesh, donate_state=True)
        state = put_replicated(state, mesh)
        replicated = NamedSharding(mesh, P())

        prev = state
        for _ in range(2):
            prev, metrics = dp_step(prev, images, boxes, valid, sizes)
            for leaf in jax.tree.leaves(prev.params):
                assert leaf.sharding.is_equivalent_to(replicated, leaf.ndim)
        assert np.isfinite(float(metrics["total"]))


class _StubGenerator:
    """Emits fixed detections (grid boxes + noise)."""

    def __init__(self, boxes, crops):
        self._boxes = boxes
        self._crops = crops
        self.confidence_threshold = 0.5

    def generate_proposals_and_images(self, image):
        return self._boxes, self._crops

    def detect_with_crops(self, image):
        return {"boxes": self._boxes,
                "scores": np.linspace(0.99, 0.6, len(self._boxes)),
                "crops": self._crops}


class _StubClassifier:
    """Labels crop i as labels[i]."""

    def __init__(self, labels, k=1):
        self._labels = labels
        self.k = k

    def classify(self, images, return_embedding=False):
        res = [[self._labels[i % len(self._labels)]]
               for i in range(len(images))]
        return (res, None) if return_embedding else res


class TestEndToEndPipeline:
    def _grid(self, rows, cols, w=20.0, h=20.0, gap=4.0):
        return np.asarray([[c * (w + gap), r * (h + gap),
                            c * (w + gap) + w, r * (h + gap) + h]
                           for r in range(rows) for c in range(cols)],
                          np.float32)

    def test_fully_compliant_scene(self):
        from cvpce_tpu.pipeline.evaluator import (PlanogramComparator,
                                                  PlanogramEvaluator)

        boxes = self._grid(3, 3)
        labels = [f"p{i}" for i in range(9)]
        rng = np.random.default_rng(0)
        detected = boxes + rng.uniform(-1, 1, boxes.shape).astype(np.float32)
        crops = np.zeros((9, 256, 256, 3), np.float32)
        evaluator = PlanogramEvaluator(
            _StubGenerator(detected, crops),
            _StubClassifier(labels),
            PlanogramComparator(),
        )
        image = np.zeros((80, 80, 3), np.float32)
        score = evaluator.evaluate(image, {"boxes": boxes, "labels": labels})
        assert score == pytest.approx(1.0)

    def test_empty_scene_scores_zero(self):
        from cvpce_tpu.pipeline.evaluator import (PlanogramComparator,
                                                  PlanogramEvaluator)

        boxes = self._grid(2, 2)
        evaluator = PlanogramEvaluator(
            _StubGenerator(np.zeros((0, 4), np.float32),
                           np.zeros((0, 256, 256, 3), np.float32)),
            _StubClassifier(["x"]),
            PlanogramComparator(),
        )
        image = np.zeros((60, 60, 3), np.float32)
        score = evaluator.evaluate(
            image, {"boxes": boxes, "labels": list("abcd")})
        assert score == 0.0

    def test_compliance_eval_loop(self):
        from cvpce_tpu.eval.compliance import evaluate_planograms
        from cvpce_tpu.pipeline.evaluator import (PlanogramComparator,
                                                  PlanogramEvaluator)

        boxes = self._grid(3, 3)
        labels = [f"p{i}" for i in range(9)]
        detected = boxes * 1.02
        crops = np.zeros((9, 256, 256, 3), np.float32)
        evaluator = PlanogramEvaluator(
            _StubGenerator(detected, crops), _StubClassifier(labels),
            PlanogramComparator(),
        )

        class _Set:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                img = np.zeros((80, 80, 3), np.float32)
                return img, {"boxes": boxes, "labels": labels,
                             "actual_accuracy": 1.0}

        res = evaluate_planograms(evaluator, _Set(), verbose=False)
        assert res["mean_accuracy"] == pytest.approx(1.0)
        assert res["mse"] == pytest.approx(0.0)


class TestSpatialSharding:
    @pytest.mark.slow
    def test_width_sharded_inference_matches_single(self):
        """Spatially-sharded GLN forward must equal unsharded output."""
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device")
        from cvpce_tpu.models.gln import GLN, postprocess_detections
        from cvpce_tpu.parallel.spatial import (make_spatial_infer,
                                                spatial_mesh)
        import jax.numpy as jnp

        cfg = GLNConfig(canvas_h=64, canvas_w=128, max_nms_candidates=128,
                        detections_per_img=64)
        model = GLN(config=cfg, train=False)
        rng = np.random.default_rng(0)
        images = rng.uniform(0, 1, (1, 64, 128, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
        sizes = np.array([[64, 128]], np.float32)

        anchors, counts = cfg.anchors()
        single = postprocess_detections(
            model.apply(variables, jnp.asarray(images)),
            jnp.asarray(anchors), counts, jnp.asarray(sizes), cfg)

        mesh = spatial_mesh(jax.devices()[:2])
        run = make_spatial_infer(variables, cfg, mesh)
        sharded = run(images, sizes)

        np.testing.assert_allclose(np.asarray(sharded["scores"]),
                                   np.asarray(single["scores"]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(sharded["boxes"]),
                                   np.asarray(single["boxes"]),
                                   atol=1e-2)


class TestRealPipelineIntegration:
    @pytest.mark.slow
    def test_proposal_generator_end_to_end(self):
        """Real ProposalGenerator (tiny random GLN) -> crops -> stub
        classifier -> compliance comparator; exercises the actual device
        pipeline wiring (detect, fused crops, graph compare)."""
        import jax.numpy as jnp

        from cvpce_tpu.models.gln import GLN
        from cvpce_tpu.pipeline.evaluator import (PlanogramComparator,
                                                  PlanogramEvaluator)
        from cvpce_tpu.pipeline.proposals import ProposalGenerator

        cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                        detections_per_img=64)
        model = GLN(config=cfg, train=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
        gen = ProposalGenerator(variables, cfg, confidence_threshold=0.0,
                                max_proposals=16)

        rng = np.random.default_rng(0)
        image = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
        res = gen.detect(image)
        assert res["boxes"].shape[1] == 4
        boxes, crops = gen.generate_proposals_and_images(image)
        assert len(boxes) == len(crops)
        if len(crops):
            assert crops.shape[1:] == (256, 256, 3)
            assert np.abs(crops).max() <= 1.0 + 1e-5  # tanh scale

        evaluator = PlanogramEvaluator(
            gen, _StubClassifier(["p0"]), PlanogramComparator())
        plano = {"boxes": np.array([[10, 10, 30, 30]], np.float32),
                 "labels": ["p0"]}
        score = evaluator.evaluate(image, plano)
        assert 0.0 <= score <= 1.0


@pytest.mark.slow
def test_sharded_eval_matches_single_device():
    """evaluate_gln over a DP mesh must produce identical metrics to the
    single-device path (NMS is per-image; sharding the batch is exact)."""
    from cvpce_tpu.data.synthetic import SyntheticShelfDataset
    from cvpce_tpu.eval.proposals import evaluate_gln
    from cvpce_tpu.models.gln import GLN

    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device")
    config = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                       detections_per_img=64)
    model = GLN(config=config, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32))
    dataset = SyntheticShelfDataset(8, 64, 64, seed=3, min_shelves=2,
                                    max_shelves=3)

    single = evaluate_gln(variables, dataset, config, thresholds=(0.5,),
                          batch_size=4, score_min=0.0)[0.5]
    mesh = data_parallel_mesh(jax.devices()[:4])
    sharded = evaluate_gln(variables, dataset, config, thresholds=(0.5,),
                           batch_size=4, score_min=0.0, mesh=mesh)[0.5]
    for key in ("ap", "ar_300", "f", "p", "r"):
        assert float(sharded[key]) == pytest.approx(float(single[key]),
                                                    abs=1e-6), key


@pytest.mark.slow
def test_detect_batch_dp_matches_per_image():
    """ProposalGenerator.detect_batch over a mesh (batch sharded, pad
    images dropped) must match the per-image single-device detect()."""
    from cvpce_tpu.pipeline.proposals import ProposalGenerator

    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device")
    import jax.numpy as jnp

    from cvpce_tpu.models.gln import GLN

    cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                    detections_per_img=64)
    model = GLN(config=cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))

    rng = np.random.default_rng(1)
    # varying aspect ratios exercise per-image canvas scales; 5 images
    # over a 4-way mesh exercises pad-and-drop
    images = [rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
              for h, w in ((96, 96), (48, 80), (80, 48), (64, 64),
                           (100, 60))]

    single = ProposalGenerator(variables, cfg, confidence_threshold=0.0)
    mesh = data_parallel_mesh(jax.devices()[:4])
    dp = ProposalGenerator(variables, cfg, confidence_threshold=0.0,
                           mesh=mesh)

    batched = dp.detect_batch(images)
    assert len(batched) == len(images)
    for image, got in zip(images, batched):
        want = single.detect(image)
        np.testing.assert_array_equal(got["valid"], want["valid"])
        keep = want["valid"]
        np.testing.assert_allclose(got["scores"][keep],
                                   want["scores"][keep], atol=1e-4)
        np.testing.assert_allclose(got["boxes"][keep],
                                   want["boxes"][keep], atol=1e-3)

    # no-mesh batch path goes through the same code
    plain = single.detect_batch(images[:2])
    np.testing.assert_array_equal(plain[0]["valid"],
                                  batched[0]["valid"])
