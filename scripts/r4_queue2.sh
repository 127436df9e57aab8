#!/bin/bash
# Round-4 gated TPU queue, part 2 (after r4_queue.sh):
#   1. backbone per-stage profile incl. the NEW int8-static pass
#      (replaces the orphaned r3_queue4 run if the tunnel ate it)
#   2. composed e2e rows for the hardened ablation: random vs
#      triplet vs 3-player at 64 products, domain shift 0.7 +
#      perspective 0.5 (same detector for every row, so the embedder
#      comparison stays fair; VERDICT r3 #4 "incl. e2e rows")
#
# Usage: nohup bash scripts/r4_queue2.sh > reports/r4_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r4_queue2 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r4_queue.pid ]]; then
  stamp "waiting on r4_queue pid $(cat /tmp/r4_queue.pid)"
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "backbone profile (bf16 b4+b8 prefixes + int8-static pass)"
$GATE python scripts/profile_backbone.py --batches 4 8 --int8 \
  > reports/profile_backbone_r4.log 2>&1
stamp "profile_backbone rc=$?"

for emb in random dihe_r4_triplet dihe_r4; do
  if [[ "$emb" == random ]]; then
    EARGS=(--embedder random)
    log=reports/e2e_shifted_random_r4.log
  else
    [[ -d "artifacts/$emb" ]] || { stamp "skip $emb (no artifact)"; continue; }
    EARGS=(--embedder dihe --dihe "artifacts/$emb")
    log=reports/e2e_shifted_${emb#dihe_}.log
  fi
  stamp "e2e shifted (64 products, shift 0.7, persp 0.5): $emb"
  $GATE python scripts/e2e_trained_pipeline.py \
    --gln artifacts/gln_r3 --products 64 \
    --domain-shift 0.7 --perspective 0.5 "${EARGS[@]}" \
    > "$log" 2>&1
  stamp "e2e $emb rc=$?"
done

stamp "queue2 complete"
