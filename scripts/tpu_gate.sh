#!/bin/bash
# Health-gated TPU job launcher.
#
# The axon tunnel wedges D2H-only and FLAPS (healthy -> broken within a
# minute, recovers on its own after tens of minutes — CLAUDE.md). A
# single preflight is therefore not enough: retry the stage-by-stage
# health check until it passes, THEN run the job; if the job exits
# non-zero, re-gate and retry it (bounded).
#
# Usage: scripts/tpu_gate.sh [--tries N] [--job-tries M] -- cmd args...
set -u
TRIES=20        # health-check attempts (sleep 240 s between) ~ 80 min
JOB_TRIES=2     # full job attempts after a non-zero exit
while [[ $# -gt 0 ]]; do
  case "$1" in
    --tries) TRIES=$2; shift 2 ;;
    --job-tries) JOB_TRIES=$2; shift 2 ;;
    --) shift; break ;;
    *) break ;;
  esac
done

HERE="$(cd "$(dirname "$0")" && pwd)"

gate() {
  local i
  for ((i = 1; i <= TRIES; i++)); do
    if timeout 600 python "$HERE/tpu_health.py"; then
      return 0
    fi
    echo "tpu_gate: health check failed ($i/$TRIES); sleeping 240s" >&2
    sleep 240
  done
  echo "tpu_gate: tunnel never became healthy after $TRIES tries" >&2
  return 1
}

for ((j = 1; j <= JOB_TRIES; j++)); do
  gate || exit 70
  echo "tpu_gate: tunnel healthy; starting job (attempt $j/$JOB_TRIES): $*" >&2
  "$@"
  rc=$?
  if [[ $rc -eq 0 ]]; then
    exit 0
  fi
  echo "tpu_gate: job exited rc=$rc" >&2
done
exit "$rc"
