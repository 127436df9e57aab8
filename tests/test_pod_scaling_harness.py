"""Virtual-mesh smoke of the pod scaling harness (VERDICT r2 #9): the
measurement script must run end to end on the 8-device CPU mesh and
produce structurally sane rows, so a real pod run is turnkey."""
import json
import subprocess
import sys
from os import path

import pytest

REPO = path.dirname(path.dirname(path.abspath(__file__)))


@pytest.mark.slow
def test_pod_scaling_virtual_mesh():
    # train sweep skipped in CI: 4 mesh-size GLN compiles are minutes on
    # the 1-core box, and DP train-step correctness is already pinned by
    # tests/test_parallel_e2e.py. The detect sweep exercises the same
    # mesh plumbing end to end.
    out = subprocess.run(
        [sys.executable, path.join(REPO, "scripts", "pod_scaling.py"),
         "--cpu", "--devices", "8", "--canvas", "128", "160",
         "--batch-per-device", "1", "--gallery-sizes", "512", "2048",
         "--emb-dim", "64", "--queries", "16", "--skip", "train"],
        capture_output=True, text=True, timeout=1200, check=True)
    rows = [json.loads(line) for line in out.stdout.splitlines()
            if line.startswith("{")]
    summary = rows[-1]
    assert summary["name"] == "SUMMARY"
    sweep = summary["detect_dp"]
    assert [r["devices"] for r in sweep] == [1, 2, 4, 8]
    assert all(r["images_per_sec"] > 0 for r in sweep)
    knn = summary["knn_crossover"]
    assert [r["gallery"] for r in knn] == [512, 2048]
    assert all(r["single_ms"] > 0 and r["sharded_ms"] > 0 for r in knn)
