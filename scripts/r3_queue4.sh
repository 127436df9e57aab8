#!/bin/bash
# Round-3 follow-up queue: perf probes that lost their slot to the
# post-reboot validation rebuild (r3_queue3.sh). Waits for queue3 to
# drain, then runs the backbone marginal-cost profiler (VERDICT r2 #6's
# last open lever: trunk at ~26 TFLOP/s, detector b8 sublinearity).
#
# Usage: nohup bash scripts/r3_queue4.sh > reports/r3_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r3_queue4 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r3_queue3.pid ]]; then
  stamp "waiting on r3_queue3 pid $(cat /tmp/r3_queue3.pid)"
  while kill -0 "$(cat /tmp/r3_queue3.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "backbone marginal profile (b4 + b8 prefixes)"
$GATE python scripts/profile_backbone.py --batches 4 8 \
  > reports/profile_backbone_r3.log 2>&1
stamp "profile_backbone rc=$?"

stamp "queue4 complete"
