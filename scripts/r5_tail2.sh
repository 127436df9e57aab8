#!/bin/bash
# Round-5 orchestrator tail 2 (replaces r5_tail.sh's remaining steps):
# the texture-task shiftpos arm beat random by +3.8 pt (~1.8 binomial
# SE) at the reference-scale budget (288 steps, enc_lr 2e-6) — the
# cheap decisive step VERDICT #2 wants is a budget/lr sweep on that
# winning arm (each run ~10 min). Then the structural Pareto.
#
# Usage: nohup bash scripts/r5_tail2.sh > reports/r5_tail2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_tail2.pid
trap 'rm -f /tmp/r5_tail2.pid' EXIT
GATE="bash scripts/tpu_gate.sh --"

stamp() { echo "[r5_tail2 $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for the color-task shiftpos arm to finish"
while ! grep -q '"DONE"' reports/dihe_shiftpos_color_r5.log 2>/dev/null; do
  sleep 30
done
stamp "color shiftpos done"

COMMON="--products 64 --views 6 --domain-shift 0.7 --perspective 0.5 \
  --texture --mode shiftpos"

stamp "shiftpos sweep: 24 epochs at enc_lr 2e-6"
$GATE python scripts/dihe_archetypes.py $COMMON --epochs 24 \
  --out checkpoints/dihe_r5tex_sp24 \
  > reports/dihe_shiftpos_sweep_r5.log 2>&1
stamp "sweep e24 rc=$?"

stamp "shiftpos sweep: 12 epochs at enc_lr 1e-5"
$GATE python scripts/dihe_archetypes.py $COMMON --epochs 12 \
  --enc-lr 1e-5 --out checkpoints/dihe_r5tex_splr \
  >> reports/dihe_shiftpos_sweep_r5.log 2>&1
stamp "sweep lr1e-5 rc=$?"

stamp "shiftpos sweep: 24 epochs at enc_lr 1e-5"
$GATE python scripts/dihe_archetypes.py $COMMON --epochs 24 \
  --enc-lr 1e-5 --out checkpoints/dihe_r5tex_splr24 \
  >> reports/dihe_shiftpos_sweep_r5.log 2>&1
stamp "sweep e24+lr rc=$?"

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
bench_row crop192 CVPCE_BENCH_CROP_RES=192
bench_row fastpreset CVPCE_BENCH_EMBED_MODEL=macresnet \
  CVPCE_BENCH_CROP_RES=192 CVPCE_BENCH_NMS_CANDIDATES=1024 \
  CVPCE_BENCH_GAUSS=0
bench_row crop224 CVPCE_BENCH_CROP_RES=224
bench_row nms1024 CVPCE_BENCH_NMS_CANDIDATES=1024

stamp "r5_tail2 complete"
