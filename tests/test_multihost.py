"""Two-process multihost smoke test (VERDICT r1 #9).

Launches two REAL processes that rendezvous through
`initialize_multihost` (jax.distributed on localhost, CPU platform),
verify the global device view, run a cross-process psum over a DP mesh,
and shard data per host via `host_shard_info` — the TPU-pod scale-out
path (replacing the reference's mp.spawn + NCCL file rendezvous,
cvpce/cli/gln.py:129-133) executed for real.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])

from cvpce_tpu.parallel.multihost import (host_shard_info,
                                          initialize_multihost)

initialize_multihost()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _ID

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cvpce_tpu.parallel import data_parallel_mesh

shard_index, num_shards = host_shard_info()
n_global = len(jax.devices())
n_local = len(jax.local_devices())

mesh = data_parallel_mesh()  # over ALL global devices
sharding = NamedSharding(mesh, P("data"))

# each process contributes its local slice of a global batch
global_shape = (n_global, 4)
local = np.full((n_local, 4), float(shard_index + 1), np.float32)
arrays = [jax.device_put(local[i:i + 1], d)
          for i, d in enumerate(jax.local_devices())]
global_batch = jax.make_array_from_single_device_arrays(
    global_shape, sharding, arrays)


@jax.jit
def total(x):
    return jnp.sum(x)  # cross-host reduction over the sharded array


result = float(total(global_batch))
print(json.dumps({
    "process": shard_index,
    "num_shards": num_shards,
    "global_devices": n_global,
    "local_devices": n_local,
    "psum_total": result,
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_psum(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["REPO_ROOT"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for pid, o in enumerate(sorted(outs, key=lambda o: o["process"])):
        assert o["process"] == pid
        assert o["num_shards"] == 2
        assert o["global_devices"] == 4   # 2 hosts x 2 local devices
        assert o["local_devices"] == 2
        # host 0 contributes 2 rows of four 1s, host 1 two rows of four
        # 2s: sum = 2*4*1 + 2*4*2 = 24
        assert o["psum_total"] == pytest.approx(24.0)


TRAIN_WORKER = r"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])

import numpy as np

from cvpce_tpu.parallel import host_local
from cvpce_tpu.parallel.multihost import initialize_multihost

initialize_multihost()

from cvpce_tpu.models.gln import GLNConfig
from cvpce_tpu.train.gln import GLNTrainConfig
from cvpce_tpu.train.loops import train_proposal_generator


class SyntheticSet:
    def __init__(self, n=8, canvas=64):
        rng = np.random.default_rng(0)  # identical on every host
        self.items = []
        for _ in range(n):
            img = rng.uniform(0, 1, (canvas, canvas, 3)).astype(np.float32)
            nb = int(rng.integers(2, 5))
            xy = rng.uniform(0, canvas - 20, (nb, 2)).astype(np.float32)
            wh = rng.uniform(8, 18, (nb, 2)).astype(np.float32)
            self.items.append({
                "image": img,
                "boxes": np.concatenate([xy, xy + wh], -1),
                "image_size": np.array([canvas, canvas], np.int32),
                "scale": np.float32(1.0),
                "orig_boxes": np.concatenate([xy, xy + wh], -1),
            })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


model_cfg = GLNConfig(canvas_h=64, canvas_w=64, max_nms_candidates=128,
                      detections_per_img=64)
train_cfg = GLNTrainConfig(match_chunk=1024, min_negatives=64)
dataset = SyntheticSet()
out = os.path.join(os.environ["WORK_DIR"],
                   f"host{jax.process_index()}")
kwargs = {}
if os.environ.get("LOADER_CLS") == "grain":
    from cvpce_tpu.data.grain_loader import GrainLoader

    kwargs["loader_cls"] = GrainLoader
result = train_proposal_generator(
    dataset, dataset, out, model_cfg=model_cfg, train_cfg=train_cfg,
    batch_size=4, epochs=1, checkpoint_interval=100, eval_interval=100,
    use_mesh=True, **kwargs)
state = result["state"]
checksum = float(sum(np.abs(host_local(l)).sum()
                     for l in jax.tree.leaves(state.params)))
print(json.dumps({
    "process": jax.process_index(),
    "steps": int(host_local(state.step)),
    "checksum": checksum,
    "devices": len(jax.devices()),
}), flush=True)
"""


@pytest.mark.slow
@pytest.mark.parametrize("loader_cls", ["prefetch", "grain"])
def test_two_process_multihost_gln_training(tmp_path, loader_cls):
    """The REAL GLN training loop over 2 processes x 2 devices: each host
    loads its own dataset shard (host_shard_info -> loader sharding),
    contributes its half of the global batch
    (make_array_from_process_local_data in the DP wrapper), grads
    all-reduce across hosts, checkpoints save process-locally. Both
    hosts must end bit-identical (replicated state). Runs with both the
    threaded PrefetchLoader and the grain loader (whose multi-host order
    is deterministic with no rendezvous)."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["REPO_ROOT"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env["WORK_DIR"] = str(tmp_path)
        env["LOADER_CLS"] = loader_cls
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"train worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    outs.sort(key=lambda o: o["process"])
    assert [o["process"] for o in outs] == [0, 1]
    import math

    for o in outs:
        assert o["devices"] == 4
        # 8 items over 2 host shards, local batch 2 -> 2 steps
        assert o["steps"] == 2
        assert math.isfinite(o["checksum"])
    assert outs[0]["checksum"] == outs[1]["checksum"]


DIHE_WORKER = r"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])

import numpy as np

from cvpce_tpu.parallel import host_local
from cvpce_tpu.parallel.multihost import initialize_multihost

initialize_multihost()

from cvpce_tpu.train.dihe import DIHETrainConfig
from cvpce_tpu.train import loops


class GallerySet:
    def __init__(self, n=16, size=64):
        rng = np.random.default_rng(1)  # identical on every host
        self.items = []
        for i in range(n):
            img = rng.uniform(-1, 1, (size, size, 3)).astype(np.float32)
            crop = rng.uniform(-1, 1, (size, size, 3)).astype(np.float32)
            hier = ["Food", f"Cat{i % 2}", f"Sub{i % 4}"]
            self.items.append((img, crop, hier, f"p{i}"))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class CropSet:
    def __init__(self, n=8, size=64):
        rng = np.random.default_rng(2)
        self.crops = rng.uniform(0, 1, (n, size, size, 3)).astype(
            np.float32)

    def __len__(self):
        return len(self.crops)

    def __getitem__(self, i):
        return self.crops[i]


# monkeypatch the epoch-end eval (it needs a GP test set)
import cvpce_tpu.eval.classification as ec

ec.eval_dihe = lambda *a, **k: {1: 0.5}

out = os.path.join(os.environ["WORK_DIR"],
                   f"dihe_host{jax.process_index()}")
result = loops.train_dihe(
    GallerySet(), CropSet(), GallerySet(), None, out, epochs=1,
    batch_size=4, checkpoint_interval=100,
    train_cfg=DIHETrainConfig(gen_downs=4), use_mesh=True)
state = result["state"]
checksum = float(sum(np.abs(host_local(l)).sum()
                     for l in jax.tree.leaves(state.emb_params)))
print(json.dumps({
    "process": jax.process_index(),
    "steps": int(host_local(state.step)),
    "checksum": checksum,
}), flush=True)
"""


@pytest.mark.slow
def test_two_process_multihost_dihe_training(tmp_path):
    """The 3-player DIHE loop over 2 processes x 2 devices: per-host
    loader shards of the 2x-batch stream, global-array assembly for all
    five step inputs, cross-host all-reduce for every player's grads,
    host-local encoder eval. Both hosts end bit-identical."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["REPO_ROOT"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env["WORK_DIR"] = str(tmp_path)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", DIHE_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"dihe worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    import math

    outs.sort(key=lambda o: o["process"])
    for o in outs:
        # 16 items over 2 host shards (8), local 2x-batch 4 -> 2 steps
        assert o["steps"] == 2
        assert math.isfinite(o["checksum"])
    assert outs[0]["checksum"] == outs[1]["checksum"]
