#!/bin/bash
# Round-5 gated TPU queue, part 4 (after r5_queue3): the structural
# serving Pareto (VERDICT r4 #4) — accuracy deltas via pareto_study.py,
# throughput via labeled non-default bench rows. PERF.md gets the
# combined img/s-vs-accuracy table; the default bench stays
# parity-honest.
#
# Usage: nohup bash scripts/r5_queue4.sh > reports/r5_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_queue4.pid
trap 'rm -f /tmp/r5_queue4.pid' EXIT
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r5_queue4 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r5_queue3.pid ]]; then
  stamp "waiting on r5_queue3 pid $(cat /tmp/r5_queue3.pid)"
  while kill -0 "$(cat /tmp/r5_queue3.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "pareto accuracy study (embed variants + NMS budgets)"
$GATE python scripts/pareto_study.py --gln artifacts/gln_r5 \
  > reports/pareto_study_r5.log 2>&1
stamp "pareto_study rc=$?"

bench_row() {
  local label=$1; shift
  stamp "bench row: $label"
  $GATE env "$@" python bench.py \
    > "reports/bench_${label}_r5.log" 2> "reports/bench_${label}_r5.err"
  stamp "bench $label rc=$? $(tail -1 reports/bench_${label}_r5.log)"
}

bench_row trained_parity CVPCE_BENCH_WEIGHTS=artifacts/gln_r5
bench_row macresnet CVPCE_BENCH_EMBED_MODEL=macresnet
bench_row crop224 CVPCE_BENCH_CROP_RES=224
bench_row crop192 CVPCE_BENCH_CROP_RES=192
bench_row nms1024 CVPCE_BENCH_NMS_CANDIDATES=1024
bench_row fastpreset CVPCE_BENCH_EMBED_MODEL=macresnet \
  CVPCE_BENCH_CROP_RES=192 CVPCE_BENCH_NMS_CANDIDATES=1024 \
  CVPCE_BENCH_GAUSS=0

stamp "queue4 complete"
