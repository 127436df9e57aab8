"""GrainLoader (data/grain_loader.py): deterministic order, shard
partitioning, PrefetchLoader interface parity, mid-epoch resume, and a
real train-loop integration."""
import numpy as np
import pytest

from cvpce_tpu.data.grain_loader import GrainLoader
from cvpce_tpu.data.loader import PrefetchLoader


class _Ints:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return int(i)


def _collate(items):
    return list(items)


class TestGrainLoader:
    def test_deterministic_across_instances(self):
        a = GrainLoader(_Ints(23), 4, _collate, seed=5)
        b = GrainLoader(_Ints(23), 4, _collate, seed=5)
        for e in range(2):
            a.set_epoch(e)
            b.set_epoch(e)
            assert list(a) == list(b)

    def test_epochs_reshuffle_same_multiset(self):
        ld = GrainLoader(_Ints(24), 4, _collate, seed=1, drop_last=False)
        ld.set_epoch(0)
        e0 = [x for b in ld for x in b]
        ld.set_epoch(1)
        e1 = [x for b in ld for x in b]
        assert sorted(e0) == sorted(e1) == list(range(24))
        assert e0 != e1

    def test_shards_partition_each_epoch(self):
        n, shards = 23, 3
        loaders = [GrainLoader(_Ints(n), 2, _collate, seed=9,
                               drop_last=False, shard_index=s,
                               num_shards=shards) for s in range(shards)]
        for e in range(2):
            seen = []
            for ld in loaders:
                ld.set_epoch(e)
                seen += [x for b in ld for x in b]
            assert sorted(seen) == list(range(n))

    def test_len_matches_prefetch_loader(self):
        for n, bs, drop, shards in [(23, 4, True, 1), (23, 4, False, 1),
                                    (23, 4, True, 3), (24, 4, False, 3)]:
            for s in range(shards):
                g = GrainLoader(_Ints(n), bs, _collate, drop_last=drop,
                                shard_index=s, num_shards=shards)
                p = PrefetchLoader(_Ints(n), bs, _collate, drop_last=drop,
                                   shard_index=s, num_shards=shards)
                assert len(g) == len(p), (n, bs, drop, shards, s)
                assert len(list(g)) == len(g)

    def test_no_shuffle_preserves_order(self):
        ld = GrainLoader(_Ints(10), 3, _collate, shuffle=False,
                         drop_last=False)
        assert [x for b in ld for x in b] == list(range(10))

    def test_iter_from_matches_epoch_tail(self):
        for drop in (True, False):
            ld = GrainLoader(_Ints(23), 4, _collate, seed=7,
                             drop_last=drop, shard_index=1, num_shards=2)
            ld.set_epoch(2)
            full = list(ld)
            for k in (0, 1, len(full) - 1, len(full)):
                assert list(ld.iter_from(k)) == full[k:], (drop, k)

    def test_iterator_reshuffles_per_epoch(self):
        ld = GrainLoader(_Ints(12), 3, _collate, seed=4)
        batches = list(ld.iterator(num_epochs=2))
        e0 = [x for b in batches[:4] for x in b]
        e1 = [x for b in batches[4:] for x in b]
        assert sorted(e0) == sorted(e1) == list(range(12))
        assert e0 != e1

    def test_mid_epoch_resume(self):
        ld = GrainLoader(_Ints(40), 4, _collate, seed=3)
        it = ld.iterator(num_epochs=2)
        consumed = [next(it) for _ in range(3)]
        state = it.get_state()
        rest = list(it)

        it2 = GrainLoader(_Ints(40), 4, _collate, seed=3).iterator(
            num_epochs=2)
        it2.set_state(state)
        assert list(it2) == rest
        assert len(consumed) + len(rest) == 20  # 2 epochs x 10 batches


def test_resume_position():
    from cvpce_tpu.train.loops import _resume_position

    grain_ld = GrainLoader(_Ints(8), 2, _collate)
    legacy_ld = PrefetchLoader(_Ints(8), 2, _collate)
    # mid-epoch checkpoint + skip-capable loader -> resume inside epoch
    assert _resume_position({"epoch": 3, "epoch_step": 1}, 4,
                            grain_ld) == (3, 2)
    # end-of-epoch checkpoint -> next epoch
    assert _resume_position({"epoch": 3, "epoch_step": 3}, 4,
                            grain_ld) == (4, 0)
    # legacy loader or pre-epoch_step checkpoint -> reference semantics
    assert _resume_position({"epoch": 3, "epoch_step": 1}, 4,
                            legacy_ld) == (4, 0)
    assert _resume_position({"epoch": 3}, 4, grain_ld) == (4, 0)


@pytest.mark.slow
def test_gln_loop_mid_epoch_resume(tmp_path):
    """A checkpoint taken after batch 1 of a 4-batch epoch resumes on
    batch 2 with GrainLoader (2 more optimizer steps) but restarts at
    the next epoch with PrefetchLoader (4 more steps)."""
    import json
    import os

    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import GLNTrainConfig
    from cvpce_tpu.train.loops import train_proposal_generator
    from tests.test_train_loops import _SyntheticDetectionSet

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    dataset = _SyntheticDetectionSet(n=4)

    for loader_cls, expect_steps in ((GrainLoader, 6), (PrefetchLoader, 8)):
        out = str(tmp_path / loader_cls.__name__)
        r1 = train_proposal_generator(
            dataset, dataset, out, model_cfg=model_cfg,
            train_cfg=train_cfg, batch_size=1, epochs=1,
            checkpoint_interval=100, eval_interval=100, use_mesh=False,
            loader_cls=loader_cls)
        assert int(np.asarray(r1["state"].step)) == 4

        # rewrite the meta to simulate preemption right after batch 1
        meta_path = os.path.join(out, "checkpoint.meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta.update(epoch=0, iteration=1, epoch_step=1)
        with open(meta_path, "w") as f:
            json.dump(meta, f)

        r2 = train_proposal_generator(
            dataset, dataset, out, model_cfg=model_cfg,
            train_cfg=train_cfg, batch_size=1, epochs=1,
            checkpoint_interval=100, eval_interval=100, use_mesh=False,
            resume=True, loader_cls=loader_cls)
        assert int(np.asarray(r2["state"].step)) == expect_steps, \
            loader_cls.__name__


@pytest.mark.slow
def test_gln_loop_runs_with_grain_loader(tmp_path):
    from cvpce_tpu.models.gln import GLNConfig
    from cvpce_tpu.train.gln import GLNTrainConfig
    from cvpce_tpu.train.loops import train_proposal_generator
    from tests.test_train_loops import _SyntheticDetectionSet

    model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                          detections_per_img=64)
    train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
    dataset = _SyntheticDetectionSet()
    result = train_proposal_generator(
        dataset, dataset, str(tmp_path / "run"), model_cfg=model_cfg,
        train_cfg=train_cfg, batch_size=1, epochs=1,
        checkpoint_interval=100, eval_interval=100, use_mesh=False,
        loader_cls=GrainLoader,
    )
    assert np.isfinite(float(np.asarray(result["state"].step)))
