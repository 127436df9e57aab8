#!/bin/bash
# Round-4 gated TPU queue 2c: im2col + fold bench measurements (after
# the 2b probes, before the long extended-DIHE run) — decides whether
# CVPCE_BENCH_IM2COL/FOLD become bench defaults this round.
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"
stamp() { echo "[r4_queue2c $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r4_queue2b.pid ]]; then
  stamp "waiting on r4_queue2b pid $(cat /tmp/r4_queue2b.pid)"
  while kill -0 "$(cat /tmp/r4_queue2b.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "bench with im2col thin-Cin convs"
$GATE env CVPCE_BENCH_IM2COL=1 python bench.py \
  > reports/bench_im2col_r4.log 2>&1
stamp "bench_im2col rc=$?"
stamp "queue2c complete"
