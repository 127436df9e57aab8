"""Deterministic, resumable input pipeline over Google grain.

A drop-in for `data/loader.py:PrefetchLoader` (same constructor surface,
`set_epoch` / `__len__` / `__iter__`) built on `grain.MapDataset`, the
TPU-ecosystem replacement for torch DataLoader workers + torch
DistributedSampler (reference wiring: cvpce/proposals_training.py:83,
cvpce/classification_training.py:405-418). What grain adds over the
thread-pool loader:

- **Bit-deterministic global order** from (seed, epoch, shard) alone —
  every host of a pod derives its own disjoint slice of the same global
  permutation with no rendezvous (the reference needs NCCL rendezvous
  for DistributedSampler's `set_epoch` to agree).
- **Mid-epoch checkpointing**: `iterator()` returns a grain
  `DatasetIterator` whose `get_state()`/`set_state()` serialize the
  exact stream position, so a preempted training job resumes on the
  batch it would have seen — torch DataLoader can only restart epochs.
- **Threaded read-ahead** via grain's prefetch (`ReadOptions`), like
  PrefetchLoader's pool.

Sharding matches PrefetchLoader semantics exactly: the per-epoch
permutation is sliced `[shard_index::num_shards]` AFTER shuffling, so
shards partition every epoch and reshuffle each epoch (verified in
tests/test_grain_loader.py).
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional

import grain

# Large stride keeps per-epoch fallback seeds (seed*_SEED_STRIDE+epoch)
# disjoint across user seeds; grain's own repeat() mechanism is used on
# the streaming path instead.
_SEED_STRIDE = 1 << 20


class GrainLoader:
    def __init__(self, dataset, batch_size: int, collate: Callable,
                 shuffle: bool = True, num_threads: int = 8,
                 prefetch_batches: int = 2, seed: int = 0,
                 drop_last: bool = True,
                 shard_index: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.num_threads = num_threads
        self.prefetch_batches = prefetch_batches
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    # -- PrefetchLoader-compatible epoch interface --------------------

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_len(self) -> int:
        n = len(self.dataset)
        # len of range(n)[shard_index::num_shards]
        return (n - self.shard_index + self.num_shards - 1) \
            // self.num_shards

    def __len__(self) -> int:
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _epoch_chain(self, epoch: int,
                     skip_batches: int = 0) -> "grain.MapDataset":
        ds = grain.MapDataset.source(self.dataset)
        if self.shuffle:
            # repeat() advances grain's internal epoch so shuffle
            # re-permutes; slicing one epoch back out keeps batches
            # from straddling epoch boundaries (drop_last is per-epoch)
            n = len(self.dataset)
            ds = ds.seed(self.seed).shuffle().repeat(epoch + 1).slice(
                slice(epoch * n, (epoch + 1) * n))
        ds = ds.slice(slice(self.shard_index, None, self.num_shards))
        if skip_batches:
            # whole-batch skip AFTER sharding keeps batch boundaries
            # (and the drop_last remainder) identical to a full epoch
            ds = ds.slice(slice(skip_batches * self.batch_size, None))
        return ds.batch(self.batch_size, drop_remainder=self.drop_last,
                        batch_fn=self.collate)

    def _read_options(self) -> "grain.ReadOptions":
        # grain requires prefetch_buffer_size >= num_threads (warns today,
        # slated to become an error); extra threads beyond the buffer
        # can't run anyway, so clamp.
        threads = min(self.num_threads, self.prefetch_batches)
        return grain.ReadOptions(num_threads=threads,
                                 prefetch_buffer_size=self.prefetch_batches)

    def __iter__(self) -> Iterator:
        return iter(self._epoch_chain(self.epoch)
                    .to_iter_dataset(self._read_options()))

    def iter_from(self, skip_batches: int) -> Iterator:
        """The current epoch's stream minus its first `skip_batches`
        batches — the order is a pure function of (seed, epoch, shard),
        so a resumed process reproduces the exact remaining batches a
        preempted run would have seen. The skip is a dataset slice: no
        skipped sample is ever loaded. Used by the train loops for
        exact mid-epoch resume (train/loops.py)."""
        return iter(self._epoch_chain(self.epoch, skip_batches)
                    .to_iter_dataset(self._read_options()))

    # -- grain-native resumable stream ---------------------------------

    def iterator(self, num_epochs: Optional[int] = None
                 ) -> "grain.DatasetIterator":
        """Resumable batch stream across epochs (reshuffled per epoch).

        The returned grain `DatasetIterator` supports `get_state()` /
        `set_state(state)` (and `save(path)`/`load(path)`) for exact
        mid-epoch resume. Note: on this path batches straddle epoch
        boundaries when the shard size doesn't divide by batch_size and
        drop_last=False; with drop_last=True the remainder of the FULL
        stream is dropped, not per epoch — the per-epoch `__iter__`
        interface keeps reference drop_last semantics.
        """
        ds = grain.MapDataset.source(self.dataset)
        if self.shuffle:
            ds = ds.seed(self.seed).shuffle()
        ds = ds.slice(slice(self.shard_index, None, self.num_shards))
        ds = ds.repeat(num_epochs)
        batched = ds.batch(self.batch_size,
                           drop_remainder=self.drop_last,
                           batch_fn=self.collate)
        return iter(batched.to_iter_dataset(self._read_options()))
