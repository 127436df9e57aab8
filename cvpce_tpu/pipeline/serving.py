"""Params-only serving exports for trained checkpoints.

The training loops checkpoint the FULL train state (params + optimizer
moments + rng + counters, ~3x the param bytes — train/checkpoint.py,
matching the reference's torch.save of model+optimizer+scheduler,
cvpce/proposals_training.py:103-139). Serving surfaces only need the
inference collections. This module exports those as a small standalone
orbax checkpoint (plus the serving_calibration.json sidecar, so the
calibrated threshold and input preprocessing travel with the weights —
pipeline/calibrate.py), and loads EITHER layout:

- a serving export (``serving_checkpoint`` inside the directory), or
- a full training run directory (rotating ``checkpoint`` /
  ``embedder_checkpoint``), restored raw — no train-state template, no
  model init, no optimizer reconstruction.

Raw (template-free) restore is safe here because orbax
StandardCheckpointer persists the tree structure with the arrays; we
extract collections by name and validate presence. This also makes
serving loads independent of training-code pytree layout changes.

Why this exists operationally: checkpoints/ is scratch space on the dev
box (wiped on VM reboots), while a ~120 MB params-only export is small
enough to live in git under artifacts/ — a trained detector survives
the box.
"""
from __future__ import annotations

import json
import os
import shutil
from os import path
from typing import Any, Dict, Optional, Tuple

from .calibrate import CALIBRATION_FILE

SERVING_NAME = "serving_checkpoint"


def _raw_restore(target: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    # orbax rejects relative paths ("Checkpoint path should be absolute")
    return ocp.StandardCheckpointer().restore(path.abspath(target))


def _save(target: str, tree: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    target = path.abspath(target)
    if path.exists(target):
        shutil.rmtree(target)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, tree)
    ckptr.wait_until_finished()


def _copy_sidecars(run_dir: str, out_dir: str, meta_src: str) -> None:
    cal = path.join(run_dir, CALIBRATION_FILE)
    if path.exists(cal):
        shutil.copyfile(cal, path.join(out_dir, CALIBRATION_FILE))
    meta = path.join(run_dir, meta_src + ".meta.json")
    if path.exists(meta):
        shutil.copyfile(meta,
                        path.join(out_dir, SERVING_NAME + ".meta.json"))


def export_gln_serving(run_dir: str, out_dir: str,
                       name: str = "checkpoint") -> str:
    """Export a GLN training run's inference collections
    (params/frozen/batch_stats) + calibration sidecar to `out_dir`."""
    state = _raw_restore(path.join(run_dir, name))
    tree = {"params": state["params"], "frozen": state["frozen"],
            "batch_stats": state["batch_stats"]}
    os.makedirs(out_dir, exist_ok=True)
    _save(path.join(out_dir, SERVING_NAME), tree)
    _copy_sidecars(run_dir, out_dir, name)
    return out_dir


def export_dihe_serving(run_dir: str, out_dir: str,
                        name: str = "embedder_checkpoint") -> str:
    """Export a DIHE run's encoder (emb_params/emb_stats) to `out_dir`.
    GAN generator/discriminator and all optimizer states stay behind —
    eval needs only the embedder (cvpce/cli/dihe.py:301-309)."""
    state = _raw_restore(path.join(run_dir, name))
    tree = {"params": state["emb_params"],
            "batch_stats": state["emb_stats"]}
    os.makedirs(out_dir, exist_ok=True)
    _save(path.join(out_dir, SERVING_NAME), tree)
    _copy_sidecars(run_dir, out_dir, name)
    return out_dir


def _serving_path(ckpt_dir: str) -> Optional[str]:
    p = path.join(ckpt_dir, SERVING_NAME)
    return p if path.exists(p) else None


def load_gln_variables(ckpt_dir: str,
                       name: str = "checkpoint") -> Dict[str, Any]:
    """Load GLN inference variables {params, frozen, batch_stats} from
    either a serving export or a full training-run directory.

    The serving-export shortcut applies only for the DEFAULT name: a
    caller that asked for a specific checkpoint node (e.g. epoch_87)
    must get that node, not a coexisting serving export in the same
    directory."""
    serving = _serving_path(ckpt_dir) if name == "checkpoint" else None
    state = _raw_restore(serving or path.join(ckpt_dir, name))
    missing = [k for k in ("params", "frozen", "batch_stats")
               if k not in state]
    if missing:
        raise ValueError(
            f"{ckpt_dir} is not a GLN checkpoint: missing {missing}")
    return {"params": state["params"], "frozen": state["frozen"],
            "batch_stats": state["batch_stats"]}


def load_dihe_encoder(ckpt_dir: str,
                      name: str = "embedder_checkpoint"
                      ) -> Tuple[Any, Any]:
    """Load a DIHE encoder's (params, batch_stats) from either layout.

    Rejects GLN trees: a GLN serving export also carries params/
    batch_stats, so without the 'frozen'-collection check a
    ``--load-enc artifacts/gln_r3`` would silently merge foreign GLN
    params into a random-init MACVGG and serve garbage (ADVICE r3)."""
    serving = (_serving_path(ckpt_dir)
               if name == "embedder_checkpoint" else None)
    state = _raw_restore(serving or path.join(ckpt_dir, name))
    if "frozen" in state:
        raise ValueError(
            f"{ckpt_dir} looks like a GLN checkpoint (has a 'frozen' "
            f"collection), not a DIHE encoder")
    if "params" in state:          # serving export
        return state["params"], state["batch_stats"]
    if "emb_params" in state:      # full 3-player train state
        return state["emb_params"], state["emb_stats"]
    raise ValueError(f"{ckpt_dir} is not a DIHE checkpoint "
                     f"(keys: {sorted(state)})")


def load_serving_meta(ckpt_dir: str) -> Dict:
    p = path.join(ckpt_dir, SERVING_NAME + ".meta.json")
    if not path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)
