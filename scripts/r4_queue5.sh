#!/bin/bash
# Round-4 gated TPU queue, part 5 (after r4_queue4.sh): the augtriplet
# ablation arm — triplet training with domain-shifted ANCHORS, the
# classical no-GAN augmentation baseline. Run at EXACTLY the hardened
# r4 ablation config (64 archetypes, shift 0.7, perspective 0.5,
# 12 epochs) so the four arms are directly comparable:
#   random 0.5843 / triplet 0.4596 / 3player 0.5219 (dihe_archetypes_r4)
# If plain anchor augmentation matches or beats the 3-player arm, the
# GAN machinery is not earning its complexity on this gap; if it stays
# below, GAN anchoring is doing real work beyond augmentation.
#
# Usage: nohup bash scripts/r4_queue5.sh > reports/r4_queue5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r4_queue5 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r4_queue4.pid ]]; then
  stamp "waiting on r4_queue4 pid $(cat /tmp/r4_queue4.pid)"
  while kill -0 "$(cat /tmp/r4_queue4.pid)" 2>/dev/null; do sleep 60; done
fi

stamp "augtriplet (12 epochs, hardened gap)"
$GATE python scripts/dihe_archetypes.py --mode augtriplet \
  --products 64 --views 6 --domain-shift 0.7 --perspective 0.5 \
  --epochs 12 --out checkpoints/dihe_r4aug \
  > reports/dihe_augtriplet_r4.log 2>&1
stamp "augtriplet rc=$?"

python scripts/export_serving.py --kind dihe \
  --run checkpoints/dihe_r4aug_augtriplet --out artifacts/dihe_r4aug \
  >> reports/dihe_augtriplet_r4.log 2>&1
stamp "export dihe_r4aug rc=$?"

stamp "queue5 complete"
