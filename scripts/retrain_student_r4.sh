#!/bin/bash
# Round-4 student retrain (after the replay-scatter TPU fix) with a
# continuous banker: best/last checkpoints + metrics are copied into
# checkpoints/student_r4 every 2 minutes so a round-boundary kill cannot
# lose the result (outputs/ does not survive; checkpoints/ is tracked and
# the driver commits uncommitted work at teardown).
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/student_r4

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}
OUT=${OUT:-outputs/student_r4_rep2}

(
  while sleep 120; do
    for f in metrics.jsonl best_success.ckpt last.ckpt; do
      [ -s "$OUT/$f" ] && cp "$OUT/$f" checkpoints/student_r4/ 2>/dev/null
    done
  done
) &
BANKER=$!
trap 'kill $BANKER 2>/dev/null' EXIT

CKPT="$TEACHER" NUM_ENVS=256 timeout "${STUDENT_S:-4500}" bash scripts/train_s2.sh \
  dagger.replay_size="${REPLAY_K:-100000}" \
  eval_freq_steps=2e6 eval_envs=256 max_epochs="${STUDENT_EPOCHS:-1500}" \
  output="$OUT"
rc=$?
echo "student rc=$rc (124 = wall-clock cap)"
for f in metrics.jsonl best_success.ckpt last.ckpt; do
  [ -s "$OUT/$f" ] && cp "$OUT/$f" checkpoints/student_r4/ && echo "banked $f"
done
exit $rc
