#!/bin/bash
# Round-5 TPU orchestrator (replaces the pid-chained r5_queue2..4):
# one sequential script, so the convergence check can gate everything
# downstream without pid races.
#
#   0. wait for r5_queue1 (15-epoch shift-augmented retrain) to finish
#   1. if final AP < 0.78, RESUME the run (+8 epochs, up to 3 times) —
#      the 0.85/0.65 augmentation maxes converge slower than the r3
#      task (r5 epoch-5 AP 0.04 vs r3's 0.16); train_convergence
#      --resume continues from the rotating checkpoint, and
#      --calibrate re-picks the serving threshold on the final weights
#   2. export artifacts/gln_r5, then the e2e matrices (shifted 6-arm,
#      in-domain 3-arm, 30 scenes each — VERDICT r4 #1/#5)
#   3. texture-task DIHE ablation + shiftpos/bn-adapt arms (VERDICT #2)
#   4. structural Pareto: pareto_study.py + labeled bench rows (#4)
#
# Usage: nohup bash scripts/r5_main.sh > reports/r5_main.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_main.pid
trap 'rm -f /tmp/r5_main.pid' EXIT
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r5_main $(date -u +%H:%M:%S)] $*"; }

if [[ -f /tmp/r5_queue1.pid ]]; then
  stamp "waiting on r5_queue1 pid $(cat /tmp/r5_queue1.pid)"
  while kill -0 "$(cat /tmp/r5_queue1.pid)" 2>/dev/null; do sleep 60; done
fi

final_ap() {
  grep -o '"final_ap": [0-9.]*' reports/convergence_gln_r5.log \
    | tail -1 | grep -o '[0-9.]*$' || echo 0
}

EPOCHS=15
for try in 1 2 3; do
  AP=$(final_ap)
  stamp "convergence check: final_ap=${AP:-none} after ${EPOCHS} epochs"
  if python - "$AP" <<'PY'
import sys
sys.exit(0 if float(sys.argv[1] or 0) >= 0.78 else 1)
PY
  then break; fi
  EPOCHS=$((EPOCHS + 8))
  stamp "resume retrain to ${EPOCHS} epochs (attempt $try)"
  $GATE python scripts/train_convergence.py --scene-mix mixed \
    --canvas 832 1344 --epochs $EPOCHS --calibrate \
    --domain-shift 0.85 --perspective 0.65 --plano-styles 64 \
    --target-ap 2.0 --out checkpoints/gln_r5 --resume \
    >> reports/convergence_gln_r5.log 2>&1
  stamp "resume rc=$?"
done

stamp "export gln_r5 (final_ap=$(final_ap))"
python scripts/export_serving.py --kind gln \
  --run checkpoints/gln_r5 --out artifacts/gln_r5 \
  >> reports/convergence_gln_r5.log 2>&1
stamp "export rc=$?"

if [[ ! -d artifacts/gln_r5 ]]; then
  stamp "FATAL: artifacts/gln_r5 missing"
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

stamp "color task: shiftpos arm (lever (a) on the r4 gap)"
$GATE python scripts/dihe_archetypes.py --mode shiftpos $COMMON \
  --out checkpoints/dihe_r5col_sp \
  > reports/dihe_shiftpos_color_r5.log 2>&1
stamp "color shiftpos rc=$?"

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

stamp "r5_main complete"
