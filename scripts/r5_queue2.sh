#!/bin/bash
# Round-5 gated TPU queue, part 2 (after r5_queue1): the FULL e2e matrix
# VERDICT r4 #1 asks for, at >=30 scenes (VERDICT r4 #5), using the
# multi-arm e2e runner (one detection pass per scene, every embedder arm
# classifies it — scripts/e2e_trained_pipeline.py --arms).
#
#   shifted task (64 products, shift 0.7 + perspective 0.5), detector
#   artifacts/gln_r5 (full 15-epoch shift-augmented retrain):
#     random            — the r4 comparison arm (BN-free random MACVGG)
#     random+cc         — + scene-statistics color correction (lever:
#                         pipeline/colorcorrect.py)
#     randombn+bnshift  — BN-statistics adaptation on shifted crops
#                         (VERDICT r4 task-2 lever (c))
#     randombn+bnshift+cc — both serving-side levers
#     dihe:artifacts/dihe_r4     — 3-player GAN-anchored (r4)
#     dihe:artifacts/dihe_r4aug  — classical augtriplet (r4)
#
#   in-domain task (12 products, no shift) — the must-not-regress check:
#     random, random+cc (cc must be ~no-op in-domain),
#     dihe:artifacts/dihe_r3_triplet (the best r3 composed arm)
#
# Usage: nohup bash scripts/r5_queue2.sh > reports/r5_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_queue2.pid
trap 'rm -f /tmp/r5_queue2.pid' EXIT
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r5_queue2 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r5_queue1.pid ]]; then
  stamp "waiting on r5_queue1 pid $(cat /tmp/r5_queue1.pid)"
  while kill -0 "$(cat /tmp/r5_queue1.pid)" 2>/dev/null; do sleep 60; done
fi

if [[ ! -d artifacts/gln_r5 ]]; then
  stamp "FATAL: artifacts/gln_r5 missing (queue1 failed?)"
  exit 1
fi

stamp "shifted e2e matrix (6 arms, 30 scenes, gln_r5)"
$GATE python scripts/e2e_trained_pipeline.py --gln artifacts/gln_r5 \
  --products 64 --scenes 30 --domain-shift 0.7 --perspective 0.5 \
  --arms "random,random+cc,randombn+bnshift,randombn+bnshift+cc,dihe:artifacts/dihe_r4,dihe:artifacts/dihe_r4aug" \
  > reports/e2e_shifted_matrix_r5.log 2>&1
stamp "shifted matrix rc=$?"

stamp "in-domain e2e (3 arms, 30 scenes, gln_r5)"
$GATE python scripts/e2e_trained_pipeline.py --gln artifacts/gln_r5 \
  --products 12 --scenes 30 \
  --arms "random,random+cc,dihe:artifacts/dihe_r3_triplet" \
  > reports/e2e_indomain_matrix_r5.log 2>&1
stamp "in-domain matrix rc=$?"

stamp "queue2 complete"
