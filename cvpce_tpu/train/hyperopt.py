"""Hyperparameter search: random sampling + ASHA early stopping.

Re-design of the reference's Ray Tune usage (cvpce/hyperopt.py,
cvpce/cli/gln.py:135-228, cvpce/cli/dihe.py:169-255: HyperOptSearch +
ASHAScheduler, one GPU per trial, max_failures=2 for exploding-gradient
trials). Single-controller JAX makes trials sequential on one
mesh/chip, so this is a lean in-process implementation: log-uniform /
choice sampling and the standard ASHA promotion rule, with failure
tolerance for exploded losses.

Search spaces from the reference:
- GLN (cli/gln.py:171-200): tanh, lr multiplier, scale_class,
  scale_gaussian, gauss_loss_neg_thresh, gauss_loss_pos_thresh
- DIHE (cli/dihe.py:224-228): batchnorm, enc_multiplier, enc_lr
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


class Domain:
    def sample(self, rng) -> Any:
        raise NotImplementedError


@dataclasses.dataclass
class Uniform(Domain):
    low: float
    high: float

    def sample(self, rng):
        return float(rng.uniform(self.low, self.high))


@dataclasses.dataclass
class LogUniform(Domain):
    low: float
    high: float

    def sample(self, rng):
        return float(np.exp(rng.uniform(math.log(self.low),
                                        math.log(self.high))))


@dataclasses.dataclass
class Choice(Domain):
    options: Sequence

    def sample(self, rng):
        return self.options[int(rng.integers(len(self.options)))]


# reference search spaces
GLN_SPACE: Dict[str, Domain] = {
    "tanh": Choice([True, False]),
    "multiplier": Uniform(0.98, 1.0),
    "scale_class": LogUniform(0.1, 10.0),
    "scale_gaussian": LogUniform(0.1, 10.0),
    "gauss_loss_neg_thresh": Uniform(0.0, 0.5),
    "gauss_loss_pos_thresh": Uniform(0.1, 1.0),
}

DIHE_SPACE: Dict[str, Domain] = {
    "batchnorm": Choice([True, False]),
    "enc_multiplier": Uniform(0.9, 1.0),
    "enc_lr": LogUniform(1e-8, 1e-5),
}


@dataclasses.dataclass
class Trial:
    trial_id: int
    config: Dict[str, Any]
    results: List[float] = dataclasses.field(default_factory=list)
    failed: bool = False
    stopped: bool = False

    @property
    def best(self) -> float:
        return max(self.results) if self.results else float("-inf")


class ASHA:
    """Asynchronous Successive Halving promotion rule."""

    def __init__(self, max_epochs: int = 9, grace_period: int = 1,
                 reduction_factor: int = 3):
        self.max_epochs = max_epochs
        self.grace = grace_period
        self.rf = reduction_factor
        self.rungs = []
        r = grace_period
        while r < max_epochs:
            self.rungs.append(r)
            r *= reduction_factor

    def should_stop(self, trial: Trial, all_trials: List[Trial]) -> bool:
        epoch = len(trial.results)
        if epoch >= self.max_epochs:
            return True
        if epoch not in self.rungs:
            return False
        # among trials that reached this rung, keep the top 1/rf
        peers = [t.results[epoch - 1] for t in all_trials
                 if len(t.results) >= epoch and not t.failed]
        if len(peers) < self.rf:
            return False
        cutoff = np.quantile(peers, 1.0 - 1.0 / self.rf)
        return trial.results[epoch - 1] < cutoff


def run_search(
    train_one_epoch: Callable[[Dict, int, Optional[Any]], tuple],
    space: Dict[str, Domain],
    num_trials: int = 16,
    max_epochs: int = 9,
    grace_period: int = 1,
    reduction_factor: int = 3,
    max_failures: int = 2,
    seed: int = 0,
    verbose: bool = True,
) -> Dict:
    """Run the search.

    Args:
      train_one_epoch: (config, epoch, carry) -> (metric, carry). `carry`
        holds live training state between epochs of the same trial
        (None on epoch 0). Raise to signal a failed trial (e.g. exploded
        loss, proposals_training.py:238-242).

    Returns dict with 'best_config', 'best_metric', 'trials'.
    """
    rng = np.random.default_rng(seed)
    scheduler = ASHA(max_epochs, grace_period, reduction_factor)
    trials: List[Trial] = []

    for tid in range(num_trials):
        config = {k: d.sample(rng) for k, d in space.items()}
        trial = Trial(tid, config)
        trials.append(trial)
        carry = None
        failures = 0
        epoch = 0
        while epoch < max_epochs:
            try:
                metric, carry = train_one_epoch(config, epoch, carry)
            except Exception as e:  # noqa: BLE001 — trial-level tolerance
                failures += 1
                if verbose:
                    print(f"[trial {tid}] failure {failures}: {e}")
                if failures > max_failures:
                    trial.failed = True
                    break
                continue
            trial.results.append(float(metric))
            if verbose:
                print(f"[trial {tid}] epoch {epoch}: {metric:.4f} "
                      f"config={config}")
            if scheduler.should_stop(trial, trials):
                trial.stopped = True
                break
            epoch += 1

    ok = [t for t in trials if not t.failed and t.results]
    best = max(ok, key=lambda t: t.best) if ok else None
    return {
        "best_config": best.config if best else None,
        "best_metric": best.best if best else None,
        "trials": trials,
    }
