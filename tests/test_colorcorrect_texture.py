"""Round-5 units: scene-statistics color correction, texture-carried
archetype identity, degenerate-box filtering after perspective warps."""
import numpy as np

from cvpce_tpu.data.synthetic import (_augment_scene, _texture_field,
                                      apply_domain_shift,
                                      product_gallery_image, product_styles)
from cvpce_tpu.pipeline.colorcorrect import (estimate_gray_world_gains,
                                             gallery_feedback_gains,
                                             scene_color_correct)


def _busy_scene(rng, h=128, w=192):
    """A content-diverse 'scene' whose channel means are near-neutral."""
    img = np.full((h, w, 3), 0.35, np.float32)
    for _ in range(30):
        y, x = rng.integers(0, h - 16), rng.integers(0, w - 16)
        img[y:y + 16, x:x + 16] = rng.uniform(0.1, 0.9, 3)
    return np.clip(img, 0, 1)


def test_gray_world_recovers_known_cast():
    rng = np.random.default_rng(0)
    img = _busy_scene(rng)
    cast = np.asarray([1.25, 0.95, 0.8], np.float32)
    gains = estimate_gray_world_gains(np.clip(img * cast, 0, 1))
    # estimated gains undo the cast up to the shared luma scale
    ratio = gains * cast
    assert np.all(np.abs(ratio / ratio.mean() - 1.0) < 0.05)


def test_correction_near_identity_on_neutral_scene():
    rng = np.random.default_rng(1)
    img = _busy_scene(rng)
    out = scene_color_correct(img)
    assert np.abs(out - img).mean() < 0.02


def test_correction_reduces_distance_to_clean():
    """On average over shift draws (gray-world undoes the cast but not
    gamma, so single draws can go either way — the serving metric is
    classification, scripts/probe_colorcorrect.py)."""
    rng = np.random.default_rng(2)
    img = _busy_scene(rng)
    d_raw, d_cc = [], []
    for seed in range(6):
        shifted = apply_domain_shift(img, np.random.default_rng(seed), 0.7)
        corrected = scene_color_correct(shifted)
        d_raw.append(np.abs(shifted - img).mean())
        d_cc.append(np.abs(corrected - img).mean())
    assert np.mean(d_cc) < np.mean(d_raw)


def test_gallery_feedback_gains_robust_to_label_noise():
    """Self-calibrating white balance: with 60% correct matches, the
    median crop<->gallery color ratio recovers the scene cast even
    though 40% of the pairs are mismatched."""
    rng = np.random.default_rng(4)
    gal = rng.uniform(0.2, 0.9, (64, 3)).astype(np.float32)
    cast = np.asarray([1.3, 0.95, 0.7], np.float32)
    labels = rng.integers(0, 64, 200)
    crops = gal[labels] * cast
    pred = labels.copy()
    wrong = rng.random(200) < 0.4
    pred[wrong] = rng.integers(0, 64, int(wrong.sum()))
    gains = gallery_feedback_gains(crops, gal[pred])
    assert np.all(np.abs(gains * cast - 1.0) < 0.12)


def test_texture_field_range_and_determinism():
    tex = {"kind": "checker", "freq": 4.0, "phase": 0.3, "contrast": 0.5}
    f1 = _texture_field(tex, 64, 32)
    f2 = _texture_field(tex, 64, 32)
    assert f1.shape == (64, 32)
    assert np.array_equal(f1, f2)
    assert f1.min() >= 0.5 - 1e-6 and f1.max() <= 1.0 + 1e-6
    # the pattern actually modulates (both levels present)
    assert f1.min() < 0.6 and f1.max() > 0.9


def test_texture_scale_invariant_pattern():
    """Normalized product coordinates: the same texture rendered at two
    sizes matches after resize (gallery render vs in-scene instance)."""
    import cv2

    tex = {"kind": "diag", "freq": 3.2, "phase": 0.1, "contrast": 0.4}
    small = _texture_field(tex, 48, 24)
    big = cv2.resize(_texture_field(tex, 192, 96), (24, 48),
                     interpolation=cv2.INTER_AREA)
    corr = np.corrcoef(small.ravel(), big.ravel())[0, 1]
    assert corr > 0.9


def test_texture_styles_render_distinct_and_survive_shift():
    styles = product_styles(8, texture=True)
    assert all("texture" in s for s in styles)
    imgs = [product_gallery_image(s, height=96) for s in styles]
    # distinct archetypes stay distinct in pixel space
    flat = [cv.mean() for cv in imgs]
    assert len(set(np.round(flat, 3))) > 4
    # pattern survives a strong photometric shift: the shifted render
    # correlates with its own clean render far better than with a
    # different archetype sharing no pattern
    rng = np.random.default_rng(5)
    a = imgs[0]
    a_shift = apply_domain_shift(a, rng, 0.7)
    self_corr = np.corrcoef(a_shift.mean(-1).ravel(),
                            a.mean(-1).ravel())[0, 1]
    assert self_corr > 0.6


def test_untextured_styles_unchanged():
    """texture=False keeps the r1..r4 archetype recipe bit-identical
    (headline comparability)."""
    s = product_styles(4)
    assert all("texture" not in st for st in s)


def test_augment_scene_drops_degenerate_boxes():
    rng = np.random.default_rng(11)
    img = np.full((64, 64, 3), 0.4, np.float32)
    boxes = np.asarray([[0.0, 0.0, 1.5, 1.5], [20, 20, 44, 44]],
                       np.float32)
    for seed in range(8):
        out_img, out_boxes = _augment_scene(
            img, boxes, np.random.default_rng(seed), 0.0, 1.0)
        if len(out_boxes):
            w = out_boxes[:, 2] - out_boxes[:, 0]
            h = out_boxes[:, 3] - out_boxes[:, 1]
            assert np.all(w >= 2.0) and np.all(h >= 2.0)
