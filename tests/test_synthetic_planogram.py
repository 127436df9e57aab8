"""Identity-carrying synthetic planogram scenes
(data/synthetic.py:product_styles/planogram_scene/product_gallery_image)
— the ground-truth generator for the trained end-to-end pipeline
validation (scripts/e2e_trained_pipeline.py)."""
import numpy as np

from cvpce_tpu.data.synthetic import (planogram_scene, product_gallery_image,
                                      product_styles)


def test_styles_deterministic_and_distinct():
    a = product_styles(12)
    b = product_styles(12)
    assert [s["label"] for s in a] == [f"prod_{i:02d}" for i in range(12)]
    for sa, sb in zip(a, b):
        np.testing.assert_array_equal(sa["color"], sb["color"])
    colors = np.stack([s["color"] for s in a])
    d = np.linalg.norm(colors[:, None] - colors[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.1  # archetypes are separable by color alone


def test_scene_deterministic():
    st = product_styles(8)
    i1, p1, a1, e1 = planogram_scene(256, 320, st,
                                     np.random.default_rng(5), 0.3)
    i2, p2, a2, e2 = planogram_scene(256, 320, st,
                                     np.random.default_rng(5), 0.3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(p1["boxes"], p2["boxes"])
    assert a1["labels"] == a2["labels"] and e1 == e2


def test_intact_scene_matches_planogram():
    st = product_styles(8)
    img, plano, actual, expected = planogram_scene(
        256, 320, st, np.random.default_rng(0), violation_rate=0.0)
    assert expected == 1.0
    np.testing.assert_array_equal(plano["boxes"], actual["boxes"])
    assert plano["labels"] == actual["labels"]
    assert img.shape == (256, 320, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    b = plano["boxes"]
    assert (b[:, 0] < b[:, 2]).all() and (b[:, 1] < b[:, 3]).all()
    assert (b[:, [0, 2]] <= 320).all() and (b[:, [1, 3]] <= 256).all()


def test_violations_accounted():
    st = product_styles(8)
    img, plano, actual, expected = planogram_scene(
        256, 320, st, np.random.default_rng(1), violation_rate=0.4)
    n_plan, n_act = len(plano["labels"]), len(actual["labels"])
    assert n_act <= n_plan  # removals only shrink the rendered set
    # expected == fraction of planned slots rendered with the intended
    # label at the intended box
    act_key = {tuple(b): l for b, l in
               zip(actual["boxes"].tolist(), actual["labels"])}
    intact = sum(act_key.get(tuple(b)) == l for b, l in
                 zip(plano["boxes"].tolist(), plano["labels"]))
    assert abs(expected - intact / n_plan) < 1e-9
    assert 0.3 < expected < 0.95  # rate 0.4 actually produced violations


def test_gallery_render():
    st = product_styles(4)
    for s in st:
        g = product_gallery_image(s)
        assert g.ndim == 3 and g.shape[2] == 3 and g.dtype == np.float32
        assert g.shape[0] == 200  # height + padding
        # dominant color near the archetype base color (center pixel,
        # away from border/band)
        h, w, _ = g.shape
        px = g[h // 10 + 4, w // 2]
        assert np.linalg.norm(px - np.clip(s["color"] * 1.0, 0, 1)) < 0.35


def test_comparator_exact_on_clean_inputs():
    """The full compliance machinery (graph build -> MCS -> RANSAC ->
    per-label IoU matching) recovers expected compliance EXACTLY when
    fed ground-truth boxes/labels — scripts/e2e_trained_pipeline.py's
    oracle column, pinned here (reference path:
    cvpce/production.py:86-116)."""
    from cvpce_tpu.pipeline.evaluator import PlanogramComparator

    st = product_styles(12)
    comp = PlanogramComparator()
    for vr in (0.0, 0.2, 0.3):
        img, plano, actual, expected = planogram_scene(
            256, 320, st, np.random.default_rng((41, 1)),
            violation_rate=vr)
        c = comp.compare(plano, actual, image=img)
        assert abs(c - expected) < 1e-6, (vr, c, expected)
