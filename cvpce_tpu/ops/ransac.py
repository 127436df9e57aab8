"""Batched RANSAC homography estimation on device.

TPU-native replacement for cv2.findHomography(..., RANSAC) — the one C++
call on the reference's compliance path (cvpce/planograms.py:199). RANSAC is
embarrassingly parallel and maps perfectly to the TPU: all S candidate
4-point minimal samples are solved at once (batched 8x9 DLT via
jnp.linalg.svd), all reprojection errors are one broadcasted computation,
and the winner is an argmax. A final least-squares refit on the winning
inlier set replaces cv2's LM polish.

Results are statistically (not bitwise) equivalent to cv2: RANSAC is
stochastic in both implementations (SURVEY.md §7 hard-part 5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _hartley_normalize(pts: Array, valid: Array):
    """Similarity transform T s.t. valid points have zero mean and mean
    distance sqrt(2) from origin. pts (N, 2), valid (N,) -> (pts', T)."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    centered = pts - mean
    dist = jnp.sqrt((centered**2).sum(-1) + 1e-12)
    mean_dist = (dist * w).sum() / n
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-8)
    t = jnp.array([
        [scale, 0.0, -scale * mean[0]],
        [0.0, scale, -scale * mean[1]],
        [0.0, 0.0, 1.0],
    ], pts.dtype)
    return centered * scale, t


def _dlt_rows(src: Array, dst: Array) -> Array:
    """DLT constraint rows for correspondences src->(dst). (K,2)x2 -> (2K,9)."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    return jnp.concatenate([r1, r2], axis=0)


def _solve_dlt(src: Array, dst: Array, weights: Array | None = None) -> Array:
    """Least-squares homography from weighted correspondences via SVD."""
    a = _dlt_rows(src, dst)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=0)
        a = a * w2[:, None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    h = vt[-1]
    return h.reshape(3, 3)


def project_points(h: Array, pts: Array, eps: float = 1e-12) -> Array:
    """Apply homography h (3,3) to (..., 2) points."""
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    p = jnp.concatenate([pts, ones], axis=-1)
    q = p @ h.T
    z = q[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    return q[..., :2] / z


def project_boxes(h: Array, boxes: Array) -> Array:
    """Project xyxy boxes corner-wise: (x1,y1) and (x2,y2) through h
    (mirrors cvpce/planograms.py:206-208)."""
    p1 = project_points(h, boxes[..., 0:2])
    p2 = project_points(h, boxes[..., 2:4])
    return jnp.concatenate([p1, p2], axis=-1)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def find_homography_ransac(src: Array, dst: Array, valid: Array,
                           key: Array, reproj_threshold: float = 10.0,
                           num_samples: int = 512):
    """RANSAC homography fit, all hypotheses evaluated in parallel.

    Args:
      src, dst: (N, 2) corresponding points (padded rows allowed).
      valid: (N,) bool mask of real correspondences.
      key: PRNG key.
      reproj_threshold: forward-reprojection inlier radius (pixels), same
        contract as cv2 (the reference passes min(h,w)*0.01 or 10 —
        cvpce/production.py:80-84).
      num_samples: RANSAC hypothesis count.

    Returns:
      (h, inliers, ok): (3,3) homography mapping src->dst, (N,) bool inlier
      mask, and a scalar bool that a valid fit exists (>= 4 inliers).
    """
    n = src.shape[0]
    nvalid = valid.sum()

    # Normalize once globally for conditioning (each minimal sample reuses
    # the global normalization; equivalent up to conditioning).
    src_n, t_src = _hartley_normalize(src, valid)
    dst_n, t_dst = _hartley_normalize(dst, valid)

    # Draw 4 distinct valid indices per hypothesis: top-4 of random scores.
    scores = jax.random.uniform(key, (num_samples, n))
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    _, sample_idx = jax.lax.top_k(scores, 4)  # (S, 4)

    def solve_one(idx):
        return _solve_dlt(src_n[idx], dst_n[idx])

    hs = jax.vmap(solve_one)(sample_idx)  # (S, 3, 3)

    # Denormalize: H = T_dst^-1 @ Hn @ T_src
    t_dst_inv = jnp.linalg.inv(t_dst)
    hs_full = jnp.einsum("ij,sjk,kl->sil", t_dst_inv, hs, t_src)

    proj = jax.vmap(lambda h: project_points(h, src))(hs_full)  # (S, N, 2)
    err2 = ((proj - dst[None]) ** 2).sum(-1)  # (S, N)
    inlier = (err2 < reproj_threshold**2) & valid[None, :]
    counts = inlier.sum(-1)
    best = jnp.argmax(counts)
    best_inliers = inlier[best]

    # Refit on the winning inlier set (normalized coords for conditioning).
    w = best_inliers.astype(src.dtype)
    h_refit_n = _solve_dlt(src_n, dst_n, w)
    h_refit = t_dst_inv @ h_refit_n @ t_src
    proj_r = project_points(h_refit, src)
    err2_r = ((proj_r - dst) ** 2).sum(-1)
    inlier_r = (err2_r < reproj_threshold**2) & valid
    use_refit = inlier_r.sum() >= counts[best]
    h_best = jnp.where(use_refit, h_refit, hs_full[best])
    inliers = jnp.where(use_refit, inlier_r, best_inliers)

    h_best = h_best / jnp.where(jnp.abs(h_best[2, 2]) > 1e-12, h_best[2, 2], 1.0)
    ok = (inliers.sum() >= 4) & (nvalid >= 4)
    return h_best, inliers, ok
