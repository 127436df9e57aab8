#!/bin/bash
# Round-4 gated TPU queue, part 6 (after r4_queue5.sh): shift-augmented
# detector FINE-TUNE — the r4 shifted-e2e collapse is detector-dominated
# (recall 0.68 at shift 0.7 vs 0.93 in-domain, QUALITY.md), and the
# continuation session shipped both levers: ranged per-scene
# domain-shift/perspective augmentation in the detection sets and
# warm-starting from a serving export (load_orbax/--init-from).
# 5 epochs at lr 5e-4 from the converged artifacts/gln_r3 instead of a
# ~70-min from-scratch run; eval + calibration inherit the augmented
# (half-clean..fully-shifted) distribution, so per-epoch AP tracks the
# shifted recovery directly. Then a shifted e2e row with the fine-tuned
# detector (random embedder — the strongest classify arm at shift 0.7)
# to quantify composed recovery vs the 0.6507 row in QUALITY.md.
#
# Usage: nohup bash scripts/r4_queue6.sh > reports/r4_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r4_queue6 $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r4_queue5.pid ]]; then
  stamp "waiting on r4_queue5 pid $(cat /tmp/r4_queue5.pid)"
  while kill -0 "$(cat /tmp/r4_queue5.pid)" 2>/dev/null; do sleep 30; done
fi

stamp "shift-augmented fine-tune from artifacts/gln_r3 (5 epochs)"
$GATE python scripts/train_convergence.py --scene-mix mixed \
  --canvas 832 1344 --epochs 5 --lr 5e-4 --calibrate \
  --domain-shift 0.7 --perspective 0.5 --plano-styles 64 \
  --init-from artifacts/gln_r3 --target-ap 2.0 \
  --out checkpoints/gln_r4ft \
  > reports/gln_finetune_shift_r4.log 2>&1
stamp "finetune rc=$?"

python scripts/export_serving.py --kind gln \
  --run checkpoints/gln_r4ft --out artifacts/gln_r4ft \
  >> reports/gln_finetune_shift_r4.log 2>&1
stamp "export gln_r4ft rc=$?"

stamp "shifted e2e with fine-tuned detector (random embedder)"
$GATE python scripts/e2e_trained_pipeline.py --gln artifacts/gln_r4ft \
  --products 64 --domain-shift 0.7 --perspective 0.5 \
  --embedder random \
  > reports/e2e_shifted_ft_random_r4.log 2>&1
stamp "e2e_shifted_ft rc=$?"

stamp "queue6 complete"
