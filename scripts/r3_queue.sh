#!/bin/bash
# Round-3 serialized TPU job queue.
#
# One real chip behind a flapping tunnel + one host CPU core: TPU jobs
# must run one at a time, each behind the health gate (tpu_gate.sh).
# This waits for the in-flight GLN full-canvas training run (pid file),
# then runs the rest of the round-3 validation chain in dependency
# order, logging each to reports/.
#
# Usage: nohup bash scripts/r3_queue.sh > reports/r3_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r3_queue $(date -u +%H:%M:%S)] $*"; }

# 1. wait out any in-flight TPU job launched separately (the GLN
#    trainer, or the standalone calibration run after a cut-short
#    training run)
for pf in /tmp/gln_r3.pid /tmp/cal_r3.pid; do
  if [[ -f $pf ]]; then
    stamp "waiting on $(basename "$pf") pid $(cat "$pf")"
    while kill -0 "$(cat "$pf")" 2>/dev/null; do sleep 60; done
  fi
done
stamp "prior TPU jobs done (training log tail):"
tail -3 reports/convergence_gln_r3.log || true

# 2. DIHE archetype-domain ablation (VERDICT r2 #2): baseline vs
#    pure-triplet vs 3-player on the e2e classify task
stamp "starting dihe_archetypes"
$GATE python scripts/dihe_archetypes.py --mode both --epochs 12 \
  --out /root/repo/checkpoints/dihe_r3 \
  > reports/dihe_archetypes_r3.log 2>&1
stamp "dihe_archetypes rc=$?"

# 3. e2e pipeline validation at the calibrated operating point
#    (VERDICT r2 #1) with each available embedder
if [[ -f checkpoints/gln_r3/serving_calibration.json ]]; then
  stamp "e2e: random embedder"
  $GATE python scripts/e2e_trained_pipeline.py --embedder random \
    > reports/e2e_trained_random_r3.log 2>&1
  stamp "e2e random rc=$?"
  for mode in dihe triplet; do
    dir=checkpoints/dihe_r3
    [[ $mode == triplet ]] && dir=checkpoints/dihe_r3_triplet
    if [[ -d $dir ]]; then
      stamp "e2e: $mode embedder ($dir)"
      $GATE python scripts/e2e_trained_pipeline.py --embedder dihe \
        --dihe "$dir" > "reports/e2e_trained_${mode}_r3.log" 2>&1
      stamp "e2e $mode rc=$?"
    fi
  done
else
  stamp "SKIP e2e: no serving_calibration.json (training failed?)"
fi

# 4. int8 AP parity at the production operating point (VERDICT r2 #5)
if [[ -d checkpoints/gln_r3 ]]; then
  stamp "int8 AP-parity check on gln_r3"
  $GATE python scripts/detector_int8_check.py --ckpt checkpoints/gln_r3 \
    --canvas 832 1344 --det-per-img 1000 --nms-candidates 5120 \
    --scene-mix mixed --batch-size 2 \
    > reports/detector_int8_r3.log 2>&1
  stamp "int8 check rc=$?"
fi

# 5. backbone marginal profile (VERDICT r2 #6 last open lever)
stamp "backbone profile"
$GATE python scripts/profile_backbone.py \
  > reports/profile_backbone_r3.log 2>&1
stamp "backbone profile rc=$?"

stamp "queue complete"
