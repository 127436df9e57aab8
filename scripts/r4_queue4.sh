#!/bin/bash
# Round-4 gated TPU queue, part 4 (continuation session): the extended
# 3-player run that r4_queue3.sh queued but the round ended before it
# could execute (no reports/dihe_extended_r4.log ever landed; box
# rebooted since).
#
#   1. extended 3-player run at the hardened domain gap — the r4
#      ablation's in-loop eval was still rising at the 12-epoch cutoff
#      (0.520 -> 0.543, QUALITY.md "optimization-bound"); 3x the budget
#      decides whether the GAN-anchored loop crosses the random-init
#      baseline (0.5843) when trained to convergence.
#   2. export the converged encoder to git-tracked artifacts/.
#   3. rerun the shifted e2e row with the extended artifact so the
#      composed-pipeline comparison (QUALITY.md shifted table) uses the
#      best available 3-player encoder.
#
# Usage: nohup bash scripts/r4_queue4.sh > reports/r4_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r4_queue4 $(date -u +%H:%M:%S)] $*"; }

stamp "extended 3-player (36 epochs, hardened gap)"
$GATE python scripts/dihe_archetypes.py --mode 3player \
  --products 64 --views 6 --domain-shift 0.7 --perspective 0.5 \
  --epochs 36 --out checkpoints/dihe_r4c \
  > reports/dihe_extended_r4.log 2>&1
stamp "dihe_extended rc=$?"

python scripts/export_serving.py --kind dihe \
  --run checkpoints/dihe_r4c --out artifacts/dihe_r4c \
  >> reports/dihe_extended_r4.log 2>&1
stamp "export dihe_r4c rc=$?"

stamp "shifted e2e with extended 3-player encoder"
$GATE python scripts/e2e_trained_pipeline.py --gln artifacts/gln_r3 \
  --products 64 --domain-shift 0.7 --perspective 0.5 \
  --embedder dihe --dihe artifacts/dihe_r4c \
  > reports/e2e_shifted_r4_extended.log 2>&1
stamp "e2e_shifted_extended rc=$?"

stamp "queue4 complete"
