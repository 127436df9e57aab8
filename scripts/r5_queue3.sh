#!/bin/bash
# Round-5 gated TPU queue, part 3 (after r5_queue2): the hardened DIHE
# ablation on the TEXTURE-CARRIED identity task (VERDICT r4 #2 lever
# (d) / NEXT.md r5 #1), plus the shifted-positives arm and BN
# adaptation on both tasks.
#
# Why: on the color-carried task, shift invariance and identity are
# structurally opposed (the photometric shift perturbs the identity
# channel itself), so every trained arm loses to random init
# (QUALITY.md r4) — by construction, not by optimization failure. With
# texture-carried identity the two are compatible; this is the regime
# the reference's DIHE machinery targets (real packaging identity is
# graphic-carried, cvpce/classification_training.py:303-320).
#
# Usage: nohup bash scripts/r5_queue3.sh > reports/r5_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_queue3.pid
trap 'rm -f /tmp/r5_queue3.pid' EXIT
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r5_queue3 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r5_queue2.pid ]]; then
  stamp "waiting on r5_queue2 pid $(cat /tmp/r5_queue2.pid)"
  while kill -0 "$(cat /tmp/r5_queue2.pid)" 2>/dev/null; do sleep 60; done
fi

COMMON="--products 64 --views 6 --domain-shift 0.7 --perspective 0.5 \
  --epochs 12 --bn-adapt"

stamp "texture task: baseline + triplet + 3player"
$GATE python scripts/dihe_archetypes.py --mode both --texture $COMMON \
  --out checkpoints/dihe_r5tex \
  > reports/dihe_texture_r5.log 2>&1
stamp "texture both rc=$?"

stamp "texture task: augtriplet arm"
$GATE python scripts/dihe_archetypes.py --mode augtriplet --texture $COMMON \
  --out checkpoints/dihe_r5tex_aug \
  >> reports/dihe_texture_r5.log 2>&1
stamp "texture augtriplet rc=$?"

stamp "texture task: shiftpos arm (lever (a))"
$GATE python scripts/dihe_archetypes.py --mode shiftpos --texture $COMMON \
  --out checkpoints/dihe_r5tex_sp \
  >> reports/dihe_texture_r5.log 2>&1
stamp "texture shiftpos rc=$?"

stamp "color task: shiftpos arm (lever (a) on the r4 gap, completeness)"
$GATE python scripts/dihe_archetypes.py --mode shiftpos $COMMON \
  --out checkpoints/dihe_r5col_sp \
  > reports/dihe_shiftpos_color_r5.log 2>&1
stamp "color shiftpos rc=$?"

stamp "queue3 complete"
