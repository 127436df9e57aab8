"""Checkpoint save/restore with rotation and best-model retention.

TPU-native replacement for the reference's torch.save checkpoint scheme
(cvpce/proposals_training.py:103-139: `checkpoint.tar` rotated to
`previous_checkpoint.tar`, per-epoch best-AP-only saves, resume restoring
model/optimizer/scheduler/iteration/epoch). Uses orbax for the array
pytrees and a JSON sidecar for scalars.
"""
from __future__ import annotations

import json
import os
import shutil
from os import path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(tree):
    """Fetch every leaf to host numpy. Multi-host global arrays are not
    fully addressable; our train state is fully REPLICATED across hosts
    (parallel/mesh.py), so the local shard IS the value — fetching it
    keeps checkpointing process-local (no cross-host orbax barriers)."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)
    return jax.tree.map(fetch, tree)


class CheckpointManager:
    def __init__(self, output_dir: str, name: str = "checkpoint"):
        self.output_dir = path.abspath(output_dir)
        self.name = name
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return path.join(self.output_dir, name)

    def save_rotating(self, state: Any, meta: Dict) -> None:
        """Save `state` as <name>, rotating the existing one to
        previous_<name> (proposals_training.py:130-136)."""
        current = self._path(self.name)
        previous = self._path(f"previous_{self.name}")
        if path.exists(current):
            if path.exists(previous):
                shutil.rmtree(previous)
            os.replace(current, previous)
        self._ckptr.save(current, _to_saveable(state))
        self._ckptr.wait_until_finished()
        with open(current + ".meta.json", "w") as f:
            json.dump(meta, f)

    def save_named(self, state: Any, name: str, meta: Dict) -> None:
        target = self._path(name)
        if path.exists(target):
            shutil.rmtree(target)
        self._ckptr.save(target, _to_saveable(state))
        self._ckptr.wait_until_finished()
        with open(target + ".meta.json", "w") as f:
            json.dump(meta, f)

    def restore(self, abstract_state: Any,
                name: Optional[str] = None) -> Any:
        target = self._path(name or self.name)
        return self._ckptr.restore(target, _to_saveable(abstract_state))

    def load_meta(self, name: Optional[str] = None) -> Dict:
        target = self._path(name or self.name) + ".meta.json"
        if not path.exists(target):
            return {}
        with open(target, "r") as f:
            return json.load(f)


class BestKeeper:
    """Best-metric epoch retention (proposals_training.py:156-172,
    classification_training.py:375-395): save epoch_<e> only when the
    metric improves; always save on the final epoch."""

    def __init__(self, manager: CheckpointManager, metric_name: str):
        self.manager = manager
        self.metric_name = metric_name
        self.best = {"epoch": -1, metric_name: 0.0}

    def update(self, state: Any, epoch: int, value: float,
               final: bool = False) -> bool:
        improved = value > self.best[self.metric_name]
        if improved:
            self.best = {"epoch": epoch, self.metric_name: float(value)}
        if improved or final:
            self.manager.save_named(state, f"epoch_{epoch}",
                                    {"epoch": epoch,
                                     self.metric_name: float(value),
                                     "best": self.best})
        return improved
