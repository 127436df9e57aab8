"""kNN parity tests (numeric fixture pins the reference's
test/models/classification_test.py semantics: known nearest anchors on the
unit sphere)."""
import numpy as np

from cvpce_tpu.ops import knn

SQ22 = np.sqrt(2) / 2

ANCHORS = np.array([
    [1, 0, 0],
    [0, 1, 0],
    [0, 0, 1],
    [SQ22, SQ22, 0],
    [0, SQ22, SQ22],
], np.float32)

QUERIES = np.array([
    [0.9, 0.1, 0],     # nearest: anchor 0, then 3
    [0.1, 0.9, 0.1],   # nearest: anchor 1
    [0, 0.2, 0.8],     # nearest: anchor 2, then 4
    [0.5, 0.5, 0.05],  # nearest: anchor 3
], np.float32)


def test_nearest_neighbor_top1():
    idx = np.asarray(knn.nearest_neighbors(ANCHORS, QUERIES, k=1))
    np.testing.assert_array_equal(idx[:, 0], [0, 1, 2, 3])


def test_nearest_neighbor_top2():
    idx = np.asarray(knn.nearest_neighbors(ANCHORS, QUERIES, k=2))
    np.testing.assert_array_equal(idx[0], [0, 3])
    np.testing.assert_array_equal(idx[2], [2, 4])


def test_cosine_distance_matches_definition():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(8, 16)).astype(np.float32)
    d = np.asarray(knn.cosine_distance(a, b, axis=1))
    expected = 1 - np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    np.testing.assert_allclose(d, expected, rtol=1e-5)


def test_distance_matrix_agrees_with_pairwise():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    a = rng.normal(size=(7, 32)).astype(np.float32)
    dm = np.asarray(knn.distance_matrix(q, a))
    for i in range(5):
        for j in range(7):
            expected = 1 - np.dot(q[i], a[j]) / (
                np.linalg.norm(q[i]) * np.linalg.norm(a[j])
            )
            assert abs(dm[i, j] - expected) < 1e-4


def test_masked_knn_skips_invalid():
    valid = np.array([True, True, False, True, True])
    idx = np.asarray(
        knn.nearest_neighbors_masked(ANCHORS, valid, QUERIES[2:3], k=2)
    )
    assert 2 not in idx[0]
