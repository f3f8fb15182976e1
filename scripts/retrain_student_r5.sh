#!/bin/bash
# Round-5 student retrain (VERDICT r4 item 1): reservoir DAgger in the new
# device_split replay mode, K pinned EXPLICITLY (round-4 died on an unset
# REPLAY_K falling back to a known-crashing default — never again).
# Continuous banker: best/last checkpoints + metrics are copied into
# checkpoints/student_r5 every 2 minutes (non-empty files only).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/student_r5

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}
OUT=${OUT:-outputs/student_r5}
REPLAY_K=${REPLAY_K:-400000}   # explicit; device_split handles real scale

(
  while sleep 120; do
    for f in metrics.jsonl best_success.ckpt last.ckpt; do
      [ -s "$OUT/$f" ] && cp "$OUT/$f" checkpoints/student_r5/ 2>/dev/null
    done
  done
) &
BANKER=$!
trap 'kill $BANKER 2>/dev/null' EXIT

CKPT="$TEACHER" NUM_ENVS=256 timeout "${STUDENT_S:-7200}" bash scripts/train_s2.sh \
  dagger.replay_size="$REPLAY_K" dagger.replay_mode=device_split \
  eval_freq_steps=2e6 eval_envs=256 max_epochs="${STUDENT_EPOCHS:-1500}" \
  output="$OUT" "$@"
rc=$?
echo "student rc=$rc (124 = wall-clock cap)"
for f in metrics.jsonl best_success.ckpt last.ckpt noise_study.png; do
  [ -s "$OUT/$f" ] && cp "$OUT/$f" checkpoints/student_r5/ && echo "banked $f"
done
exit $rc
