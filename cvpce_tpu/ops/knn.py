"""Cosine distance + brute-force kNN on the MXU.

TPU-native version of the reference's embedding search
(cvpce/models/classification.py:87-95). The reference materializes a
(Q, A, D) gather and reduces it per pair; here the cosine similarity is a
single (Q, D) @ (D, A) matmul on normalized embeddings — the natural MXU
formulation — followed by top-k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-8) -> Array:
    """L2-normalize with a clamped norm (min eps), like the embedders do
    (cvpce/models/classification.py:51,85)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cosine_distance(a: Array, b: Array, axis: int = -1, eps: float = 1e-8) -> Array:
    """1 - cosine_similarity along `axis` (cvpce/models/classification.py:87-88).

    Matches torch.nn.functional.cosine_similarity semantics: each vector's
    norm is clamped to at least `eps` before the dot product.
    """
    an = jnp.linalg.norm(a, axis=axis, keepdims=True)
    bn = jnp.linalg.norm(b, axis=axis, keepdims=True)
    sim = jnp.sum(
        (a / jnp.maximum(an, eps)) * (b / jnp.maximum(bn, eps)), axis=axis
    )
    return 1.0 - sim


def distance_matrix(queries: Array, anchors: Array, eps: float = 1e-8) -> Array:
    """(Q, D) x (A, D) -> (Q, A) cosine distance matrix, one MXU matmul."""
    q = l2_normalize(queries.astype(jnp.float32), eps=eps)
    a = l2_normalize(anchors.astype(jnp.float32), eps=eps)
    # precision='highest': full-fp32 accumulation (bf16x3 passes on the MXU).
    # Cosine distances between normalized embeddings live in [0, 2]; default
    # reduced-precision matmul can flip near-tie neighbor rankings.
    sim = jnp.dot(q, a.T, preferred_element_type=jnp.float32,
                  precision="highest")
    return 1.0 - sim


@functools.partial(jax.jit, static_argnames=("k",))
def nearest_neighbors(anchors: Array, queries: Array, k: int = 1) -> Array:
    """Indices of the k nearest anchors per query, ascending distance.

    Same contract as cvpce/models/classification.py:90-95 (argsort of the
    full distance matrix, first k columns), but computed via matmul +
    lax.top_k. Ties resolve to the lowest index, like a stable argsort.
    """
    dists = distance_matrix(queries, anchors)
    _, idx = jax.lax.top_k(-dists, k)
    return idx


@functools.partial(jax.jit, static_argnames=("k",))
def nearest_neighbors_masked(anchors: Array, anchor_valid: Array,
                             queries: Array, k: int = 1) -> Array:
    """kNN over a padded anchor set: invalid anchors get +inf distance."""
    dists = distance_matrix(queries, anchors)
    dists = jnp.where(anchor_valid[None, :], dists, jnp.inf)
    _, idx = jax.lax.top_k(-dists, k)
    return idx
