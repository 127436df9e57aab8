"""Parity tests for the on-device Gaussian heatmap renderer against a tiny
host-side oracle that follows the reference's windowed per-box rendering
(cvpce/datautils.py:16-85) literally."""
import math

import numpy as np
import pytest

from cvpce_tpu.ops.gaussians import render_gaussians


def _oracle(w, h, boxes, method="mvn", join="max", tanh=False, reduction=1):
    w_r, h_r = w // reduction, h // reduction
    img = np.full((h_r, w_r), -1.0 if tanh else 0.0, np.float64)
    kant = None
    if method == "kant":
        c = 60
        xx = (np.arange(120) - c) ** 2
        kant = np.exp(-4 * math.log(2) * (xx[:, None] + xx[None, :]) / 40.0**2)

    for b in boxes:
        x1, y1, x2, y2 = (np.floor_divide(np.asarray(b, np.float64), reduction))
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        bw, bh = abs(x2 - x1), abs(y2 - y1)
        xr = np.arange(max(x1, 0), min(x2, w_r), dtype=np.float64)
        yr = np.arange(max(y1, 0), min(y2, h_r), dtype=np.float64)
        if len(xr) == 0 or len(yr) == 0:
            continue
        xxg, yyg = np.meshgrid(xr, yr, indexing="ij")
        if method == "mvn":
            var_w, var_h = (bw / 2) ** 2, (bh / 2) ** 2
            logp = -0.5 * ((yyg - cy) ** 2 / var_h + (xxg - cx) ** 2 / var_w)
            p = np.exp(logp)
            p = p / p.max()
        elif method == "simple":
            lo, hi = (-1.0, 1.0) if tanh else (0.0, 1.0)
            sw, sh = bw / 6, bh / 6
            p = (hi - lo) * np.exp(
                -((xxg - cx) ** 2 / (2 * sw**2) + (yyg - cy) ** 2 / (2 * sh**2))
            ) + lo
        elif method == "kant":
            # bilinear resize of the 120x120 kernel to (len(xr), len(yr)),
            # align_corners=False
            ow, oh = len(xr), len(yr)
            su = np.maximum((np.arange(ow) + 0.5) * 120 / ow - 0.5, 0)
            sv = np.maximum((np.arange(oh) + 0.5) * 120 / oh - 0.5, 0)
            u0 = np.clip(np.floor(su).astype(int), 0, 119)
            v0 = np.clip(np.floor(sv).astype(int), 0, 119)
            u1, v1 = np.minimum(u0 + 1, 119), np.minimum(v0 + 1, 119)
            lu, lv = su - u0, sv - v0
            p = ((1 - lu)[:, None] * (1 - lv)[None, :] * kant[np.ix_(u0, v0)]
                 + (1 - lu)[:, None] * lv[None, :] * kant[np.ix_(u0, v1)]
                 + lu[:, None] * (1 - lv)[None, :] * kant[np.ix_(u1, v0)]
                 + lu[:, None] * lv[None, :] * kant[np.ix_(u1, v1)])
        ysel = yyg.astype(int)
        xsel = xxg.astype(int)
        if join == "max":
            img[ysel, xsel] = np.maximum(img[ysel, xsel], p)
        elif join == "add":
            img[ysel, xsel] += p
        elif join == "replace":
            img[ysel, xsel] = p
    return img.astype(np.float32)


BOXES = np.array([
    [2, 3, 10, 12],
    [8, 1, 20, 9],
    [15, 14, 28, 30],
    [-3, -2, 6, 7],     # partially out of frame
], np.float32)
VALID = np.ones(4, bool)


@pytest.mark.parametrize("method", ["mvn", "simple", "kant"])
@pytest.mark.parametrize("join", ["max", "add", "replace"])
def test_render_matches_oracle(method, join):
    got = np.asarray(render_gaussians(
        BOXES, VALID, height=32, width=32, method=method, join=join
    ))
    want = _oracle(32, 32, BOXES, method=method, join=join)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tanh_background_and_scale():
    got = np.asarray(render_gaussians(
        BOXES, VALID, height=32, width=32, method="simple", join="max",
        tanh=True,
    ))
    want = _oracle(32, 32, BOXES, method="simple", join="max", tanh=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.min() == pytest.approx(-1.0)


def test_size_reduction():
    got = np.asarray(render_gaussians(
        BOXES, VALID, height=32, width=32, method="simple", join="max",
        size_reduction=2,
    ))
    want = _oracle(32, 32, BOXES, method="simple", join="max", reduction=2)
    assert got.shape == (16, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_invalid_boxes_ignored():
    valid = np.array([True, True, False, True])
    got = np.asarray(render_gaussians(
        BOXES, valid, height=32, width=32, method="simple", join="max"
    ))
    want = _oracle(32, 32, BOXES[[0, 1, 3]], method="simple", join="max")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("join", ["max", "add"])
def test_chunked_path_matches_sequential(join):
    # enough boxes to trigger the chunked associative path
    rng = np.random.default_rng(5)
    n = 80
    xy = rng.uniform(0, 20, (n, 2)).astype(np.float32)
    wh = rng.uniform(3, 10, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    valid = rng.uniform(size=n) > 0.1
    got = np.asarray(render_gaussians(
        boxes, valid, height=32, width=32, method="simple", join=join))
    want = _oracle(32, 32, boxes[valid], method="simple", join=join)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
