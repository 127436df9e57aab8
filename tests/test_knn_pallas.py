"""Fused Pallas kNN vs the XLA matmul+top_k path."""
import numpy as np
import pytest

from cvpce_tpu.ops.knn import distance_matrix, nearest_neighbors
from cvpce_tpu.ops.knn_pallas import nearest_neighbors_fused


@pytest.mark.parametrize("a,q,d,k", [(700, 16, 64, 1), (1200, 32, 128, 3),
                                     (512, 8, 256, 5)])
def test_matches_xla_knn(a, q, d, k):
    rng = np.random.default_rng(a + k)
    anchors = rng.normal(size=(a, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)

    dists, idx = nearest_neighbors_fused(anchors, queries, k=k,
                                         interpret=True)
    idx = np.asarray(idx)
    dists = np.asarray(dists)

    want_idx = np.asarray(nearest_neighbors(anchors, queries, k=k))
    full = np.asarray(distance_matrix(queries, anchors))

    # distances ascending and equal to the true k smallest
    assert (np.diff(dists, axis=1) >= -1e-6).all()
    want_d = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(dists, want_d, atol=1e-4)
    # indices agree except where distances tie
    for row in range(q):
        for slot in range(k):
            if idx[row, slot] != want_idx[row, slot]:
                assert abs(full[row, idx[row, slot]]
                           - full[row, want_idx[row, slot]]) < 1e-5


def test_small_gallery_padding():
    rng = np.random.default_rng(0)
    anchors = rng.normal(size=(5, 16)).astype(np.float32)
    queries = rng.normal(size=(3, 16)).astype(np.float32)
    dists, idx = nearest_neighbors_fused(anchors, queries, k=2,
                                         interpret=True)
    idx = np.asarray(idx)
    assert (idx >= 0).all() and (idx < 5).all()
    want = np.asarray(nearest_neighbors(anchors, queries, k=2))
    np.testing.assert_array_equal(idx, want)
