"""Multi-host initialization helpers.

The reference's multi-process story is mp.spawn + NCCL file rendezvous
(cvpce/cli/gln.py:129-133, cvpce/utils.py:269-274). The JAX equivalent is
single-controller-per-host with a coordinator address; after
`initialize_multihost()`, `jax.devices()` spans every host's chips, DCN
handles cross-host collectives, and the same DP mesh code
(parallel/mesh.py) scales out unchanged. Per-host input sharding uses
`host_shard_info()` with data.loader.PrefetchLoader's
shard_index/num_shards (replacing DistributedSampler).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Wire this host into a multi-host JAX runtime.

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), and on
    managed TPU pods jax.distributed.initialize() autodetects everything.
    No-op when running single-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_info() -> Tuple[int, int]:
    """(shard_index, num_shards) for per-host data sharding — feed into
    PrefetchLoader(shard_index=..., num_shards=...)."""
    return jax.process_index(), jax.process_count()
