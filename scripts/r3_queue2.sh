#!/bin/bash
# Round-3 stage-2 TPU queue: jobs that depend on the input-norm serving
# fix (commit 26ed23d). The stage-1 queue's random-embedder e2e ran
# BEFORE the fix (its log documents the normalization domain shift:
# P 0.28 / compliance err 0.69); this re-runs it on the corrected
# serving path and adds the qualitative render for the r3 checkpoint.
#
# Usage: nohup bash scripts/r3_queue2.sh > reports/r3_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r3_queue2 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r3_queue.pid ]]; then
  stamp "waiting on stage-1 queue pid $(cat /tmp/r3_queue.pid)"
  while kill -0 "$(cat /tmp/r3_queue.pid)" 2>/dev/null; do sleep 60; done
fi
stamp "stage-1 queue done"

stamp "e2e: random embedder (fixed input_norm)"
$GATE python scripts/e2e_trained_pipeline.py --embedder random \
  > reports/e2e_trained_random_r3b.log 2>&1
stamp "e2e random rc=$?"

stamp "qualitative render on gln_r3"
$GATE python scripts/render_detections.py \
  > reports/render_detections_r3.log 2>&1
stamp "render rc=$?"

stamp "queue2 complete"
