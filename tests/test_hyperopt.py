"""Hyperopt search tests (synthetic objective, no models)."""
import numpy as np

from cvpce_tpu.train.hyperopt import (
    ASHA,
    Choice,
    LogUniform,
    Trial,
    Uniform,
    run_search,
)


def test_domains_sample_in_range():
    rng = np.random.default_rng(0)
    for _ in range(50):
        assert 0.1 <= Uniform(0.1, 0.9).sample(rng) <= 0.9
        v = LogUniform(1e-6, 1e-2).sample(rng)
        assert 1e-6 <= v <= 1e-2
        assert Choice(["a", "b"]).sample(rng) in ("a", "b")


def test_asha_stops_weak_trials():
    sched = ASHA(max_epochs=9, grace_period=1, reduction_factor=3)
    strong = Trial(0, {}, results=[0.9])
    weak = Trial(1, {}, results=[0.1])
    mid = Trial(2, {}, results=[0.5])
    allt = [strong, weak, mid]
    assert sched.should_stop(weak, allt)
    assert not sched.should_stop(strong, allt)


def test_search_finds_good_region():
    # objective: metric = 1 - |x - 0.7|, improves with epochs slightly
    def train_one_epoch(config, epoch, carry):
        base = 1 - abs(config["x"] - 0.7)
        return base + 0.01 * epoch, (carry or 0) + 1

    res = run_search(train_one_epoch, {"x": Uniform(0, 1)},
                     num_trials=20, max_epochs=4, seed=1, verbose=False)
    assert res["best_config"] is not None
    assert abs(res["best_config"]["x"] - 0.7) < 0.2
    assert res["best_metric"] > 0.8


def test_failures_tolerated_then_fatal():
    calls = {"n": 0}

    def train_one_epoch(config, epoch, carry):
        calls["n"] += 1
        raise RuntimeError("exploded loss")

    res = run_search(train_one_epoch, {"x": Uniform(0, 1)},
                     num_trials=2, max_epochs=3, max_failures=2,
                     seed=0, verbose=False)
    assert res["best_config"] is None
    # each trial tries max_failures + 1 times
    assert calls["n"] == 2 * 3
