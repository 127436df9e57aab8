"""Gallery-sharded kNN over a device mesh.

Pod-scale extension of the serving search path (SURVEY.md §2.8 slot;
reference search is single-GPU, cvpce/models/classification.py:87-95):
the gallery embedding matrix is sharded row-wise across the mesh so a
100k+-product index scales in HBM with chip count. Each device computes
its (Q, A/n) cosine block on the MXU and reduces it to k local
candidates; the (n, Q, k) candidate sets ride one small `all_gather`
over ICI and a lexicographic merge reproduces the single-device result
exactly — including the lowest-index tie-break of `nearest_neighbors`
(ops/knn.py:52-62) — because splitting the gallery axis does not touch
the D-dimension reduction of any individual distance.

Communication is O(n·Q·k), independent of gallery size.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .knn import l2_normalize

Array = jnp.ndarray


def pad_gallery(anchors: np.ndarray, n_shards: int,
                valid: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the gallery row count to a multiple of the shard count.

    Returns (anchors_padded, valid_padded); padded rows are zero vectors
    with valid=False, which the sharded search masks to +inf distance.
    """
    a = np.asarray(anchors)
    n = a.shape[0]
    if valid is None:
        valid = np.ones((n,), bool)
    pad = (-n) % n_shards
    if pad:
        a = np.concatenate(
            [a, np.zeros((pad, a.shape[1]), a.dtype)])
        valid = np.concatenate([valid, np.zeros((pad,), bool)])
    return a, valid


def gallery_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Row-sharded placement for the padded gallery (and its mask)."""
    return NamedSharding(mesh, P(axis))


def make_sharded_nn(mesh: Mesh, k: int, axis: str = "data"):
    """Build a jitted (anchors, anchor_valid, queries) -> (dists, idx)
    sharded search.

    `anchors` (A, D) and `anchor_valid` (A,) must be padded so A divides
    the mesh size (`pad_gallery`) and SHOULD be device_put with
    `gallery_sharding` once at index load — the declared in_shardings
    then make every search run in place with no gallery re-transfer.
    Queries are replicated.

    Returns ascending-distance (Q, k) float32 distances and int32 global
    gallery indices, bit-matching `nearest_neighbors` on the unpadded
    gallery (ties to the lowest index).
    """
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def _local_search(block: Array, valid: Array, queries: Array):
        # block: (A/n, D) this shard's gallery rows; queries replicated.
        n = jax.lax.axis_size(axis)
        local_a = block.shape[0]
        q = l2_normalize(queries.astype(jnp.float32))
        g = l2_normalize(block.astype(jnp.float32))
        sim = jnp.dot(q, g.T, preferred_element_type=jnp.float32,
                      precision="highest")
        dists = jnp.where(valid[None, :], 1.0 - sim, jnp.inf)
        kk = min(k, local_a)
        neg, idx_local = jax.lax.top_k(-dists, kk)
        offset = jax.lax.axis_index(axis) * local_a
        idx_global = idx_local.astype(jnp.int32) + offset
        # (n, Q, kk) candidates on every device; O(n*Q*k) over ICI
        vals = jax.lax.all_gather(-neg, axis)
        idxs = jax.lax.all_gather(idx_global, axis)
        vals = jnp.transpose(vals, (1, 0, 2)).reshape(
            queries.shape[0], n * kk)
        idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(
            queries.shape[0], n * kk)
        # lexicographic (distance, index) sort = stable lowest-index
        # tie-break, identical to single-device top_k semantics
        vals, idxs = jax.lax.sort((vals, idxs), num_keys=2)
        return vals[:, :k], idxs[:, :k]

    # check_vma=False: outputs ARE replicated (every device holds the
    # full all_gather'ed candidate set and runs the same deterministic
    # sort) but shard_map's static replication inference can't see
    # through all_gather.
    inner = jax.shard_map(
        _local_search, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P()), check_vma=False)

    return jax.jit(inner, in_shardings=(shard, shard, repl),
                   out_shardings=(repl, repl))


def sharded_nearest_neighbors(anchors, queries, k: int,
                              mesh: Mesh, axis: str = "data") -> Array:
    """One-shot convenience mirroring `nearest_neighbors(anchors,
    queries, k)` on a mesh: pads + shards the gallery, returns (Q, k)
    global indices. For repeated searches hold the padded sharded
    gallery and call a `make_sharded_nn` product directly."""
    a, valid = pad_gallery(np.asarray(anchors), mesh.devices.size)
    search = make_sharded_nn(mesh, k, axis)
    sh = gallery_sharding(mesh, axis)
    a_dev = jax.device_put(jnp.asarray(a), sh)
    v_dev = jax.device_put(jnp.asarray(valid), sh)
    _, idx = search(a_dev, v_dev, jnp.asarray(queries))
    return idx
