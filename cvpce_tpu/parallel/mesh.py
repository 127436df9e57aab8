"""Device-mesh data parallelism.

TPU-native replacement for the reference's distributed stack
(DDP + NCCL + file rendezvous + DistributedSampler,
cvpce/proposals_training.py:191-196, SURVEY.md §2.8): a 1-D
`jax.sharding.Mesh` over all chips with the batch sharded on the 'data'
axis and parameters replicated. The gradient all-reduce that DDP performs
in backward hooks is inserted by XLA from the sharding annotations and
rides the ICI; multi-host DCN is handled by the JAX runtime. `dist.barrier`
has no equivalent — program order and `block_until_ready` cover it.

The reference's only parallelism is DP (SURVEY.md §2.8); spatial sharding
of the FPN for very large images would layer on the same mesh as a second
axis.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def make_dp_train_step(train_step: Callable, mesh: Mesh,
                       donate_state: bool = True,
                       batch_axis: int = 0) -> Callable:
    """Wrap a (state, *batch_arrays) -> (state, metrics) step for DP.

    State/params replicated, every batch array sharded on `batch_axis`
    (0 for a plain step; 1 for a `make_multi_step` scan whose batches
    carry a leading steps axis).
    XLA turns the mean-over-batch gradients into an ICI all-reduce.

    Shardings are declared via `in_shardings`, so host batches are
    transferred straight to their shards and an already-replicated state
    passes through with NO per-step host round-trip; with `donate_state`
    the previous state's buffers are reused in place (the output state is
    replicated like the input, so donation is shape/sharding compatible).
    Place the state once with `put_replicated` before the first step.
    """
    repl = replicate(mesh)
    data = NamedSharding(
        mesh, P(*([None] * batch_axis), mesh.axis_names[0]))
    jitted_by_arity: dict = {}
    multiprocess = jax.process_count() > 1

    def step(state, *batch):
        if multiprocess:
            # each host holds its own slice of the global batch (loader
            # sharded by host_shard_info); assemble the global arrays —
            # the JAX replacement for DistributedSampler + DDP scatter
            batch = tuple(
                jax.make_array_from_process_local_data(data, np.asarray(b))
                for b in batch)
        n = len(batch)
        if n not in jitted_by_arity:
            jitted_by_arity[n] = jax.jit(
                train_step,
                in_shardings=(repl,) + (data,) * n,
                donate_argnums=(0,) if donate_state else (),
            )
        return jitted_by_arity[n](state, *batch)

    return step


def put_replicated(tree, mesh: Mesh):
    if jax.process_count() > 1:
        # every host carries the full (identical) value; build the global
        # replicated array from the process-local copy
        repl = replicate(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)), tree)
    return jax.device_put(tree, replicate(mesh))


def put_sharded(tree, mesh: Mesh):
    return jax.device_put(tree, shard_batch(mesh))


def host_local(x) -> np.ndarray:
    """numpy value of an array on this host. Multi-host global arrays are
    not fully addressable; for our REPLICATED state/metrics the local
    shard is the whole value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def host_local_tree(tree):
    return jax.tree.map(host_local, tree)
