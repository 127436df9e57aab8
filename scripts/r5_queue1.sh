#!/bin/bash
# Round-5 gated TPU queue, part 1: the FULL shift-augmented detector
# retrain VERDICT r4 #1 asks for (the r4 fine-tune was a half-measure:
# eval AP 0.8146, serving recall 0.758 at shift 0.7 vs the 0.909/0.93
# in-domain detector). From scratch, 15 epochs, full canvas, mixed
# shelf+planogram scenes, 64 archetypes.
#
# Augmentation maxes are set ABOVE the shifted-e2e operating point
# (0.85/0.65 vs the task's fixed 0.7/0.5): strengths are sampled
# per-scene in [0, max], so the r4 fine-tune's 0.7/0.5 maxes put only
# the tail of the training mass at the evaluation point — its
# ranged-eval AP was 0.90 while fixed-0.7 serving recall was 0.758.
#
# Writes its pid so later queue parts can wait on it (ADVICE r4: the
# r4 queue guards waited on pid files nothing wrote).
#
# Usage: nohup bash scripts/r5_queue1.sh > reports/r5_queue1.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_queue1.pid
trap 'rm -f /tmp/r5_queue1.pid' EXIT
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r5_queue1 $(date -u +%H:%M:%S)] $*"; }

stamp "full shift-augmented retrain (15 epochs, 832x1344, mixed, 64 styles)"
$GATE python scripts/train_convergence.py --scene-mix mixed \
  --canvas 832 1344 --epochs 15 --calibrate \
  --domain-shift 0.85 --perspective 0.65 --plano-styles 64 \
  --target-ap 2.0 --out checkpoints/gln_r5 \
  > reports/convergence_gln_r5.log 2>&1
stamp "retrain rc=$?"

python scripts/export_serving.py --kind gln \
  --run checkpoints/gln_r5 --out artifacts/gln_r5 \
  >> reports/convergence_gln_r5.log 2>&1
stamp "export gln_r5 rc=$?"

stamp "queue1 complete"
