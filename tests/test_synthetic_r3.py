"""Round-3 synthetic data machinery: planogram-distribution detector
items, round-robin mixing, and the archetype-domain DIHE sets
(data/synthetic.py). These back the round-3 e2e quality work — the
detector trains on the distribution the pipeline serves
(PlanogramSceneDetectionSet), and DIHE trains on the same archetype
taxonomy the e2e gallery classifies (reference recipe: deployment
gallery + scene-crop target domain, /root/reference/cvpce/cli/dihe.py:135-147).
"""
import numpy as np

from cvpce_tpu.data.synthetic import (ArchetypeGallerySet,
                                      InterleavedDataset,
                                      PlanogramQuerySet,
                                      PlanogramSceneDetectionSet,
                                      SceneCropSet, product_styles)

H, W = 256, 384


def test_plano_detection_set_contract_and_determinism():
    ds = PlanogramSceneDetectionSet(4, canvas_h=H, canvas_w=W, seed=3)
    assert len(ds) == 4
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])
    for it in (ds[0], ds[1]):
        assert it["image"].shape == (H, W, 3)
        assert it["boxes"].ndim == 2 and it["boxes"].shape[1] == 4
        assert (it["boxes"][:, 0] < it["boxes"][:, 2]).all()
        assert (it["boxes"][:, 1] < it["boxes"][:, 3]).all()
        assert it["boxes"][:, 2].max() <= W and it["boxes"][:, 3].max() <= H
        np.testing.assert_array_equal(it["image_size"], [H, W])
        np.testing.assert_array_equal(it["orig_boxes"], it["boxes"])


def test_plano_detection_set_renders_violations():
    """Odd items render with violation_rate > 0 — some planned slots go
    missing, so odd scenes should (on average) carry fewer boxes."""
    ds_v = PlanogramSceneDetectionSet(8, canvas_h=H, canvas_w=W, seed=0,
                                      violation_rate=0.5)
    intact = [len(ds_v[i]["boxes"]) for i in range(0, 8, 2)]
    violated = [len(ds_v[i]["boxes"]) for i in range(1, 8, 2)]
    assert np.mean(violated) < np.mean(intact)


def test_interleaved_round_robin():
    a = [f"a{i}" for i in range(3)]
    b = [f"b{i}" for i in range(5)]
    ds = InterleavedDataset(a, b)
    assert len(ds) == 6  # min(3, 5) * 2
    assert [ds[i] for i in range(6)] == ["a0", "b0", "a1", "b1", "a2", "b2"]


def test_archetype_gallery_contract():
    styles = product_styles(6)
    ds = ArchetypeGallerySet(styles, views=4)
    assert len(ds) == 24
    emb, gen, hier, label = ds[0]
    assert emb.shape == gen.shape == (256, 256, 3)
    # tanh scale
    assert emb.min() >= -1.0 and emb.max() <= 1.0
    assert len(hier) == 2 and hier[1] == label == styles[0]["label"]
    # view 0 is the canonical render; later views are jittered variants
    emb1 = ds[1][0]
    assert not np.array_equal(emb, emb1)
    # same product across views keeps identity
    assert ds[1][3] == label
    assert ds[4][3] == styles[1]["label"]
    # deterministic
    np.testing.assert_array_equal(ds[5][0], ds[5][0])


def test_archetype_hierarchy_families_group_products():
    styles = product_styles(8)
    ds = ArchetypeGallerySet(styles, views=1, families=4)
    fams = [h[0] for h in ds.hierarchies]
    assert len(set(fams)) > 1  # multiple families
    assert len(set(fams)) < len(styles)  # families actually group


def test_scene_crop_set():
    styles = product_styles(6)
    ds = SceneCropSet(styles, n=16, canvas_h=H, canvas_w=W)
    assert len(ds) == 16
    for i in (0, 7, 15):
        crop = ds[i]
        assert crop.shape == (256, 256, 3)
        assert crop.min() >= 0.0 and crop.max() <= 1.0


def test_planogram_query_set():
    styles = product_styles(6)
    labels = {s["label"] for s in styles}
    ds = PlanogramQuerySet(styles, n=2, canvas_h=H, canvas_w=W)
    img, gt_labels, gt_boxes = ds[0]
    assert img.shape == (H, W, 3)
    assert len(gt_labels) == len(gt_boxes)
    assert set(gt_labels) <= labels
    # deterministic
    img2, _, _ = ds[0]
    np.testing.assert_array_equal(img, img2)
