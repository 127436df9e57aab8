#!/bin/bash
# Round-4 gated TPU queue 2b (between queue2 and queue3): short probes.
#   1. thin-Cin conv im2col probe (stem + vgg conv1_1) — PERF.md r4
#   2. folded-FBN re-measure (first run was an H2D artifact)
# Usage: nohup bash scripts/r4_queue2b.sh > reports/r4_queue2b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"
stamp() { echo "[r4_queue2b $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r4_queue2.pid ]]; then
  stamp "waiting on r4_queue2 pid $(cat /tmp/r4_queue2.pid)"
  while kill -0 "$(cat /tmp/r4_queue2.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "thin-Cin im2col probe"
$GATE python scripts/probe_stem_im2col.py \
  > reports/probe_stem_im2col_r4.log 2>&1
stamp "im2col probe rc=$?"

stamp "folded-FBN re-measure"
$GATE python scripts/profile_backbone.py --batches 4 --int8 --folded-only \
  > reports/profile_folded_r4.log 2>&1
stamp "folded rc=$?"
stamp "queue2b complete"
