#!/bin/bash
# Round-4 gated TPU queue (VERDICT r3 "Next round" items 2-5):
#   0. wait for the leftover r3_queue4 backbone profile (if running)
#   1. trained-weights bench run (CVPCE_BENCH_WEIGHTS=artifacts/gln_r3)
#   2. violation-rate sweep 0.1-0.5 on the trained serving artifacts
#   3. hardened DIHE ablation (64 archetypes + domain shift; probe
#      evidence in reports/probe_domain_gap_r4.log)
#   4. CPU-side serving exports of the r4 DIHE checkpoints
#
# Usage: nohup bash scripts/r4_queue.sh > reports/r4_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r4_queue $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r3_queue4.pid ]]; then
  stamp "waiting on r3_queue4 pid $(cat /tmp/r3_queue4.pid)"
  while kill -0 "$(cat /tmp/r3_queue4.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "trained-weights bench (artifacts/gln_r3)"
$GATE env CVPCE_BENCH_WEIGHTS=artifacts/gln_r3 python bench.py \
  > reports/bench_trained_r4.log 2>&1
stamp "bench_trained rc=$?"

stamp "violation-rate sweep (trained artifacts, rates 0.1-0.5)"
$GATE python scripts/e2e_violation_sweep.py \
  --gln artifacts/gln_r3 --dihe artifacts/dihe_r3_triplet \
  > reports/e2e_violation_sweep_r4.log 2>&1
stamp "violation_sweep rc=$?"

stamp "hardened DIHE ablation (64 archetypes, shift 0.7, persp 0.5)"
$GATE python scripts/dihe_archetypes.py --mode both \
  --products 64 --views 6 --domain-shift 0.7 --perspective 0.5 \
  --epochs 12 --out checkpoints/dihe_r4 \
  > reports/dihe_archetypes_r4.log 2>&1
stamp "dihe_archetypes rc=$?"

stamp "exporting dihe_r4 serving artifacts (CPU)"
python scripts/export_serving.py --kind dihe \
  --run checkpoints/dihe_r4 --out artifacts/dihe_r4 \
  >> reports/dihe_archetypes_r4.log 2>&1
stamp "export dihe_r4 rc=$?"
python scripts/export_serving.py --kind dihe \
  --run checkpoints/dihe_r4_triplet --out artifacts/dihe_r4_triplet \
  >> reports/dihe_archetypes_r4.log 2>&1
stamp "export dihe_r4_triplet rc=$?"

stamp "queue complete"
