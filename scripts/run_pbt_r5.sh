#!/bin/bash
# Round-5 PBT fine-tune sweep seeded from the banked best teacher (VERDICT
# r4 item 3b): 4 policies restored from teacher_r2b with spread learning
# rates, objective = REAL full-episode eval (256 envs, reference test=True
# convention), lr-only mutations (recompile-free on chip). Also the first
# real-scale exercise of the PBT subsystem.
# ~400k steps/member/interval at 512 envs; thresholds scaled to match.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/teacher_r5pbt

RESTORE=${RESTORE:-checkpoints/teacher_r2b/best_success.ckpt} \
LR_SPREAD=${LR_SPREAD:-1e-4,5e-5,2.5e-5,1.25e-5} \
EVAL_OBJECTIVE=1 EVAL_ENVS=${EVAL_ENVS:-256} \
NUM_ENVS=${NUM_ENVS:-512} POLICIES=${POLICIES:-4} \
EPOCHS_PER_INTERVAL=${EPOCHS_PER_INTERVAL:-12} INTERVALS=${INTERVALS:-24} \
START_AFTER=${START_AFTER:-1.5e6} INITIAL_DELAY=${INITIAL_DELAY:-3e6} \
WORKSPACE=outputs/pbt_r5 \
  timeout "${PBT_S:-5400}" python scripts/run_pbt.py
rc=$?
echo "pbt rc=$rc (124 = wall-clock cap)"
# bank: log + global best checkpoint from the workspace
cp outputs/pbt_r5/pbt_log.jsonl outputs/pbt_r5/best_success.ckpt checkpoints/teacher_r5pbt/ 2>/dev/null
ls outputs/pbt_r5/ | tail -5
exit $rc
