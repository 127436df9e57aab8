"""Round-4 hardened-domain machinery (VERDICT r3 #4/#5):
photometric domain shift, perspective warp, and per-slot violation
kinds in the synthetic planogram scenes."""
import numpy as np

from cvpce_tpu.data.synthetic import (apply_domain_shift,
                                      perspective_scene, planogram_scene,
                                      product_styles)

STYLES = product_styles(16)


def test_domain_shift_zero_is_noop():
    img = np.random.default_rng(0).random((32, 48, 3)).astype(np.float32)
    out = apply_domain_shift(img, np.random.default_rng(1), 0.0)
    assert out is img


def test_domain_shift_deterministic_and_bounded():
    img = np.random.default_rng(0).random((64, 96, 3)).astype(np.float32)
    a = apply_domain_shift(img, np.random.default_rng(7), 0.7)
    b = apply_domain_shift(img, np.random.default_rng(7), 0.7)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32
    assert a.min() >= 0.0 and a.max() <= 1.0
    # it actually changes the image
    assert np.abs(a - img).mean() > 0.01


def test_domain_shift_preserves_rng_stream_compat():
    """Scenes rendered with domain_shift=0 must be bit-identical to
    pre-r4 renders: the shift draws from the rng only when > 0, so
    existing seeds (detector training, e2e validation, bench) keep
    their exact scenes."""
    r1 = np.random.default_rng((5, 77, 3))
    img1, p1, a1, e1 = planogram_scene(128, 192, STYLES, r1,
                                       violation_rate=0.3)
    r2 = np.random.default_rng((5, 77, 3))
    img2, p2, a2, e2 = planogram_scene(128, 192, STYLES, r2,
                                       violation_rate=0.3,
                                       domain_shift=0.0)
    np.testing.assert_array_equal(img1, img2)
    assert e1 == e2


def test_violation_kinds_align_with_slots():
    rng = np.random.default_rng(3)
    img, plano, actual, expected = planogram_scene(
        192, 256, STYLES, rng, violation_rate=0.4)
    kinds = plano["violations"]
    assert len(kinds) == len(plano["labels"])
    n_intact = kinds.count("intact")
    n_removed = kinds.count("removed")
    n_swapped = kinds.count("swapped")
    assert n_intact + n_removed + n_swapped == len(kinds)
    # rendered gt = intact + swapped (removed slots show background)
    assert len(actual["labels"]) == n_intact + n_swapped
    assert expected == n_intact / len(kinds)
    # swapped slots carry a DIFFERENT label in actual than planned
    ai = 0
    for kind, lbl in zip(kinds, plano["labels"]):
        if kind == "removed":
            continue
        if kind == "swapped":
            assert actual["labels"][ai] != lbl
        else:
            assert actual["labels"][ai] == lbl
        ai += 1


def test_perspective_scene_identity_at_zero():
    img = np.random.default_rng(0).random((64, 96, 3)).astype(np.float32)
    boxes = np.asarray([[4, 4, 20, 30]], np.float32)
    out, oboxes, H = perspective_scene(img, boxes,
                                       np.random.default_rng(0), 0.0)
    assert out is img
    np.testing.assert_array_equal(H, np.eye(3, dtype=np.float32))


def test_perspective_scene_boxes_track_warp():
    rng = np.random.default_rng(11)
    img, plano, actual, _ = planogram_scene(192, 256, STYLES, rng)
    wimg, wboxes, H = perspective_scene(img, actual["boxes"],
                                        np.random.default_rng(2), 0.6)
    assert wimg.shape == img.shape
    assert wboxes.shape == actual["boxes"].shape
    # well-formed, in-bounds boxes
    assert (wboxes[:, 2] > wboxes[:, 0]).all()
    assert (wboxes[:, 3] > wboxes[:, 1]).all()
    assert wboxes[:, 0].min() >= 0 and wboxes[:, 1].min() >= 0
    assert wboxes[:, 2].max() <= 256 - 1 and wboxes[:, 3].max() <= 192 - 1
    # the warped box hull contains the warped product: its center maps
    # from the original center through H into the hull
    cx = (actual["boxes"][:, 0] + actual["boxes"][:, 2]) / 2
    cy = (actual["boxes"][:, 1] + actual["boxes"][:, 3]) / 2
    hom = np.stack([cx, cy, np.ones_like(cx)], axis=1) @ H.T
    px, py = hom[:, 0] / hom[:, 2], hom[:, 1] / hom[:, 2]
    inside = ((px >= wboxes[:, 0] - 1e-3) & (px <= wboxes[:, 2] + 1e-3)
              & (py >= wboxes[:, 1] - 1e-3) & (py <= wboxes[:, 3] + 1e-3))
    assert inside.all()


def test_detection_sets_ranged_augmentation():
    """Detector-training sets accept MAX-strength domain_shift/
    perspective and sample per-scene strength in [0, max] (round-5
    candidate #2: shift-augmented detector training). Defaults stay
    bit-identical to pre-augmentation renders so existing seeds keep
    their exact scenes."""
    from cvpce_tpu.data.synthetic import (PlanogramSceneDetectionSet,
                                          SyntheticShelfDataset)

    for cls in (SyntheticShelfDataset, PlanogramSceneDetectionSet):
        clean = cls(4, 128, 192, seed=3)
        auged = cls(4, 128, 192, seed=3, domain_shift=0.7,
                    perspective=0.5)
        auged2 = cls(4, 128, 192, seed=3, domain_shift=0.7,
                     perspective=0.5)
        legacy = cls(4, 128, 192, seed=3)
        for i in range(4):
            c, a, a2, l = clean[i], auged[i], auged2[i], legacy[i]
            # zero-strength default == legacy render, bit-identical
            np.testing.assert_array_equal(c["image"], l["image"])
            np.testing.assert_array_equal(c["boxes"], l["boxes"])
            # augmentation is deterministic in (seed, i)
            np.testing.assert_array_equal(a["image"], a2["image"])
            np.testing.assert_array_equal(a["boxes"], a2["boxes"])
            # it actually changes the image
            assert np.abs(a["image"] - c["image"]).mean() > 0.003
            # boxes stay well-formed and in-canvas after the warp
            b = a["boxes"]
            assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
            assert b[:, 0].min() >= 0 and b[:, 1].min() >= 0
            assert b[:, 2].max() <= 192 - 1 and b[:, 3].max() <= 128 - 1
            assert a["image"].dtype == np.float32
            assert a["image"].min() >= 0.0 and a["image"].max() <= 1.0


def test_augmented_gallery_set():
    """Index-time gallery augmentation wrapper: variant 0 passes the base
    item through untouched, variants >0 are deterministic domain-shifted
    copies in tanh scale with the annotation preserved — so the kNN index
    gains shifted entries without retraining."""
    from cvpce_tpu.data.synthetic import (ArchetypeGallerySet,
                                          AugmentedGallerySet)

    base = ArchetypeGallerySet(STYLES, views=1, seed=9)
    aug = AugmentedGallerySet(base, factor=3, strength=0.7)
    aug2 = AugmentedGallerySet(base, factor=3, strength=0.7)
    assert len(aug) == 3 * len(base)
    for j in (0, 5):
        orig = base[j]
        v0 = aug[3 * j]
        np.testing.assert_array_equal(v0[0], orig[0])
        for v in (1, 2):
            a, b = aug[3 * j + v], aug2[3 * j + v]
            np.testing.assert_array_equal(a[0], b[0])
            assert a[3] == orig[3]  # annotation preserved
            assert a[0].min() >= -1.0 and a[0].max() <= 1.0
            assert np.abs(a[0] - orig[0]).mean() > 0.003
        # the two variants differ from each other
        assert np.abs(aug[3 * j + 1][0] - aug[3 * j + 2][0]).mean() > 1e-3


def test_comparator_detailed_mask_on_violations():
    """compare_detailed's found mask aligns with planogram slots: on gt
    actual inputs, intact+swapped geometry is present but only intact
    slots carry the planned label, so removed AND swapped slots should
    come back not-found (the attribution basis of the violation
    sweep)."""
    from cvpce_tpu.pipeline.evaluator import PlanogramComparator

    rng = np.random.default_rng(21)
    img, plano, actual, expected = planogram_scene(
        256, 384, STYLES, rng, violation_rate=0.35)
    comp = PlanogramComparator()
    score, found, path = comp.compare_detailed(plano, actual, img)
    assert path == "ransac"
    assert found is not None and len(found) == len(plano["labels"])
    kinds = plano["violations"]
    intact_found = np.mean([f for f, k in zip(found, kinds)
                            if k == "intact"])
    violated_found = [f for f, k in zip(found, kinds) if k != "intact"]
    assert intact_found >= 0.8
    if violated_found:
        assert np.mean(violated_found) <= 0.2
    assert abs(score - expected) < 0.2
