#!/bin/bash
# Round-3 validation queue, post-reboot rebuild.
#
# The 2026-08-20 VM reboot wiped checkpoints/ (gitignored scratch): the
# full-canvas gln_r3 checkpoint, its calibration, and the dihe_r3 runs
# all vanished, along with the never-committed stage-1 queue logs
# QUALITY.md cites. This queue re-runs the whole round-3 validation
# chain against the retrained checkpoint and EXPORTS params-only
# serving artifacts into git-tracked artifacts/ after each training so
# the next reboot costs nothing (scripts/export_serving.py).
#
# Order = value density: the e2e random run (the serving-fix headline)
# goes first after the detector exists; DIHE training and its e2e rows
# follow; int8 parity + qualitative render last.
#
# Usage: nohup bash scripts/r3_queue3.sh > reports/r3_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r3_queue3 $(date -u +%H:%M:%S)] $*"; }

# 1. wait out the in-flight GLN trainer (train + in-process calibration)
if [[ -f /tmp/gln_r3.pid ]]; then
  stamp "waiting on GLN trainer pid $(cat /tmp/gln_r3.pid)"
  while kill -0 "$(cat /tmp/gln_r3.pid)" 2>/dev/null; do sleep 60; done
fi
stamp "GLN trainer done; log tail:"
tail -3 reports/convergence_gln_r3b.log || true

# 2. calibration fallback: the trainer's --calibrate tail writes this;
#    if the run died early, calibrate the rotating checkpoint standalone
if [[ ! -f checkpoints/gln_r3/serving_calibration.json ]]; then
  stamp "no calibration file; running standalone calibration"
  $GATE python scripts/calibrate_checkpoint.py --ckpt checkpoints/gln_r3 \
    > reports/calibrate_gln_r3.log 2>&1
  stamp "calibrate rc=$?"
fi

# 3. persist the detector into git-tracked artifacts/ (host-side job)
stamp "exporting gln_r3 serving artifact"
python scripts/export_serving.py --kind gln --run checkpoints/gln_r3 \
  --out artifacts/gln_r3 >> reports/r3_queue3.log.export 2>&1
stamp "export gln rc=$?"

# 4. e2e at the calibrated operating point, random-init embedder — the
#    serving-preprocessing-fix headline (QUALITY.md round-3 fix #3)
stamp "e2e: random embedder"
$GATE python scripts/e2e_trained_pipeline.py --embedder random \
  > reports/e2e_trained_random_r3b.log 2>&1
stamp "e2e random rc=$?"

# 5. DIHE archetype-domain ablation (baseline / pure-triplet / 3-player)
stamp "starting dihe_archetypes"
$GATE python scripts/dihe_archetypes.py --mode both --epochs 12 \
  --out /root/repo/checkpoints/dihe_r3 \
  > reports/dihe_archetypes_r3.log 2>&1
stamp "dihe_archetypes rc=$?"

for pair in dihe_r3 dihe_r3_triplet; do
  if [[ -d checkpoints/$pair ]]; then
    stamp "exporting $pair serving artifact"
    python scripts/export_serving.py --kind dihe \
      --run "checkpoints/$pair" --out "artifacts/$pair" \
      >> reports/r3_queue3.log.export 2>&1
    stamp "export $pair rc=$?"
  fi
done

# 6. e2e with the trained embedders
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

# 7. int8 AP-parity on the r3 checkpoint at production shapes
stamp "int8 AP-parity check on gln_r3"
$GATE python scripts/detector_int8_check.py --ckpt checkpoints/gln_r3 \
  --canvas 832 1344 --det-per-img 1000 --nms-candidates 5120 \
  --scene-mix mixed --batch-size 2 --skip-speed \
  > reports/detector_int8_r3.log 2>&1
stamp "int8 rc=$?"

# 8. qualitative render
stamp "qualitative render on gln_r3"
$GATE python scripts/render_detections.py \
  > reports/render_detections_r3.log 2>&1
stamp "render rc=$?"

stamp "queue3 complete"
