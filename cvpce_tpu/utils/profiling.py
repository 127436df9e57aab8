"""Profiling / tracing helpers.

The reference's only observability is wall-clock batch timing pickles
(cvpce/proposals_training.py:229,246-252) and timestamped prints
(cvpce/utils.py:313-314). Superset here: the same batch-time capture plus
jax profiler traces viewable in TensorBoard/Perfetto, and a simple scoped
timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (XLA ops, TPU timelines) to log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Per-step wall-clock recorder (the reference's batch_times list)."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._start: Optional[float] = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        assert self._start is not None
        elapsed = time.perf_counter() - self._start
        self.times.append(elapsed)
        self._start = None
        return elapsed

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        t = np.asarray(self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.median(t)),
            "p95_s": float(np.quantile(t, 0.95)),
            "steps": len(t),
        }


def print_time() -> None:
    """Timestamped marker print (cvpce/utils.py:313-314)."""
    print(f"-- {time.asctime(time.localtime())} --")
