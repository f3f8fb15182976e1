#!/bin/bash
# Round-4 session-3 chip pipeline (after the bisect decision on REPLAY_K).
# Chain: [1] student reservoir retrain (banker inside retrain_student_r4.sh)
#        [2] student eval + 10x10 noise study from the eval-gated best
#        [3] teacher phase-G2: masksucc + critic_warmup (train_s1_g2.sh)
#        [4] authoritative 1024-env eval of the G2 best
#        [5] offline student + replay eval (chip_offline_r4.sh)
# BANK-IMMEDIATELY RULE: outputs/ does not survive the round.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/student_r4 checkpoints/teacher_r4g2

wait_tpu() {
  local deadline=$(( $(date +%s) + ${WAIT_TPU_DEADLINE_S:-1800} ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 300 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
EOF
    then return 0; fi
    sleep 60
  done
  echo "wait_tpu: deadline exceeded, skipping stage" >&2
  return 1
}

bank() {
  local dst="${@: -1}"; mkdir -p "$dst"
  for src in "${@:1:$#-1}"; do
    [ -e "$src" ] && cp -r "$src" "$dst/" && echo "banked $src -> $dst"
  done
}

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}

echo "=== [1] student reservoir retrain (K=${REPLAY_K:-100000}) $(date) ==="
STAGE1_START=$(date +%s)
STAGE1_OK=0
if wait_tpu; then
  REPLAY_K="${REPLAY_K:-100000}" STUDENT_S="${STUDENT_S:-4800}" \
    bash scripts/retrain_student_r4.sh > /tmp/r4b_student.log 2>&1
  echo "student rc=$?"
  # stage gate (round-4 postmortem: a crashed retrain let stage [2] silently
  # evaluate a stale checkpoint): stage 1 counts only if it wrote non-empty
  # metrics AFTER it started
  if [ -s outputs/student_r4_rep2/metrics.jsonl ] && \
     [ "$(stat -c %Y outputs/student_r4_rep2/metrics.jsonl)" -ge "$STAGE1_START" ]; then
    STAGE1_OK=1
  fi
fi
grep -h "dagger eval" /tmp/r4b_student.log 2>/dev/null | tail -8

echo "=== [2] student noise study (10x10) $(date) ==="
SCK=""
for c in checkpoints/student_r4/best_success.ckpt checkpoints/student_r4/last.ckpt; do
  [ -f "$c" ] && [ "$(stat -c %Y "$c")" -ge "$STAGE1_START" ] && SCK="$c" && break
done
if [ "$STAGE1_OK" != 1 ]; then
  echo "stage [2] skipped: stage [1] produced no fresh metrics (would evaluate a stale checkpoint)"
  SCK=""
fi
if [ -n "$SCK" ] && wait_tpu; then
  CKPT="$TEACHER" STUDENT_CKPT="$SCK" NUM_ENVS=256 \
    timeout "${NOISE_S:-2400}" bash scripts/eval_s2.sh noise_study=True \
    output=outputs/eval_student_r4 > /tmp/r4b_noise.log 2>&1
  echo "noise rc=$?"
  bank outputs/eval_student_r4/metrics.jsonl outputs/eval_student_r4/noise_study.png \
       checkpoints/student_r4
  grep -h "Success Rate\|noise_study" /tmp/r4b_noise.log | tail -12
fi

echo "=== [3] teacher phase-G2 (masksucc + critic warmup) $(date) ==="
if wait_tpu; then
  MAX_STEPS="${G2_STEPS:-2.5e8}" timeout "${G2_S:-3300}" \
    bash scripts/train_s1_g2.sh "$TEACHER" outputs/teacher_g2_masksucc \
    > /tmp/r4b_g2.log 2>&1
  echo "G2 rc=$? (124 = cap, fine)"
fi
bank outputs/teacher_g2_masksucc/metrics.jsonl outputs/teacher_g2_masksucc/best_success.ckpt \
     outputs/teacher_g2_masksucc/last.ckpt checkpoints/teacher_r4g2
grep -o '"eval/success_rate": [0-9.]*' outputs/teacher_g2_masksucc/metrics.jsonl 2>/dev/null | tail -8

echo "=== [4] authoritative eval of G2 best $(date) ==="
BEST_G2=checkpoints/teacher_r4g2/best_success.ckpt
if [ -f "$BEST_G2" ] && wait_tpu; then
  timeout 2700 python train.py train.algo=PPO test=True num_envs=1024 eval_envs=1024 \
    checkpoint="$BEST_G2" output=outputs/eval_r4g2 > /tmp/r4b_evalG2.log 2>&1
  SR=$(grep -oP 'Success Rate: \K[0-9.]+' /tmp/r4b_evalG2.log | tail -1)
  echo "G2 authoritative success: ${SR:-none} (banked r2b: 0.8428)"
  bank outputs/eval_r4g2/metrics.jsonl checkpoints/teacher_r4g2
fi

echo "=== [5] offline student + replay eval $(date) ==="
if [ "${RUN_OFFLINE:-1}" = 1 ] && wait_tpu; then
  TEACHER="$TEACHER" bash scripts/chip_offline_r4.sh > /tmp/r4b_offline.log 2>&1
  echo "offline rc=$?"
  tail -5 /tmp/r4b_offline.log
fi

echo "=== pipeline r4b done $(date) ==="
