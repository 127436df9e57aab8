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
    _warmup_collectives()


def _warmup_collectives() -> None:
    """Establish the cross-host collective context right after init.

    The first cross-host collective triggers a rendezvous (Gloo TCP
    context on CPU; on XLA's CPU backend the key-value exchange has a
    hardcoded 30 s deadline). If that first collective only happens deep
    inside a training step — i.e. after minutes of per-host compilation —
    hosts can skew past the deadline and the whole job dies with
    "Gloo context initialization failed: DEADLINE_EXCEEDED". Running one
    trivial cross-host reduction here, microseconds after the
    jax.distributed.initialize barrier released every host at once,
    establishes the context while skew is negligible; later collectives
    over the same device set reuse it. On TPU pods this is a cheap
    fail-fast sanity barrier.
    """
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("all",))
    sharding = NamedSharding(mesh, PartitionSpec("all"))
    local = np.ones((len(jax.local_devices()),), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)
    total = float(jax.jit(lambda x: x.sum())(arr))
    expected = float(len(devices))
    if total != expected:
        raise RuntimeError(
            f"multi-host warmup reduction returned {total}, expected "
            f"{expected}: device mesh is inconsistent across hosts")


def host_shard_info() -> Tuple[int, int]:
    """(shard_index, num_shards) for per-host data sharding — feed into
    PrefetchLoader(shard_index=..., num_shards=...)."""
    return jax.process_index(), jax.process_count()
