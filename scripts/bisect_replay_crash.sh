#!/bin/bash
# Round-4: bisect the TPU InvalidArgument that killed the reservoir-replay
# student run (outputs/student_r4_rep). Isolated probes (probe_replay_tpu.py
# A-E, incl. real-scale K=400k mixed-dict) all pass on chip, so the trigger
# is in the composed epoch. Run the REAL recipe for 2 epochs at descending
# replay sizes; first config that survives marks the boundary.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}
for K in 400000 100000 0; do
  out="outputs/bisect_rep_${K}"
  echo "=== replay_size=$K ==="
  CKPT="$TEACHER" NUM_ENVS=256 timeout 1500 bash scripts/train_s2.sh \
    dagger.replay_size="$K" max_epochs=2 eval_freq_steps=1e18 \
    output="$out" 2>&1 | tail -5
  rc=$?
  echo "replay_size=$K rc=$rc"
  if [ -s "$out/metrics.jsonl" ]; then
    echo "replay_size=$K WROTE METRICS (survived)"
  fi
done
