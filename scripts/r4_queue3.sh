#!/bin/bash
# Round-4 gated TPU queue, part 3 (after r4_queue2.sh):
#   1. extended 3-player run at the hardened domain gap — the r4
#      ablation's in-loop eval was still rising at the 12-epoch cutoff
#      (0.520 -> 0.543, QUALITY.md "optimization-bound"); 3x the budget
#      decides whether the GAN-anchored loop crosses the random-init
#      baseline (0.5843) when actually trained to convergence.
#   2. folded-FBN bench measurement (CVPCE_BENCH_FOLD_FBN=1) if the
#      backbone profile showed the fold competitive.
#
# Usage: nohup bash scripts/r4_queue3.sh > reports/r4_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r4_queue3 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r4_queue2b.pid ]]; then
  stamp "waiting on r4_queue2b pid $(cat /tmp/r4_queue2b.pid)"
  while kill -0 "$(cat /tmp/r4_queue2b.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "extended 3-player (36 epochs, hardened gap)"
$GATE python scripts/dihe_archetypes.py --mode 3player \
  --products 64 --views 6 --domain-shift 0.7 --perspective 0.5 \
  --epochs 36 --out checkpoints/dihe_r4c \
  > reports/dihe_extended_r4.log 2>&1
stamp "dihe_extended rc=$?"

python scripts/export_serving.py --kind dihe \
  --run checkpoints/dihe_r4c --out artifacts/dihe_r4c \
  >> reports/dihe_extended_r4.log 2>&1
stamp "export dihe_r4c rc=$?"

stamp "queue3 complete"
