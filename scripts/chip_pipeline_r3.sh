#!/bin/bash
# Round-3 chip pipeline — runs AFTER the north-star bench (bench-first rule,
# VERDICT r2 #1). Serializes the round's TPU jobs with a DEADLINED TPU wait
# (round-2 postmortem: an unbounded wait_tpu spun for 5.5h against a dead
# backend and lost the round's evidence). Student FIRST: the visuotactile
# student is the reference paper's actual product and has not moved since
# round 1 (VERDICT r2 #2); the teacher fine-tune gets the remaining time.
#   1. student DAgger (tactile+seg+pcl) from the banked best teacher, capped
#   2. student-driven eval (first-episode, 256 envs)
#   3. phase-F teacher fine-tune (anchor-KL + anneal ladder), capped
#   4. authoritative 1024-env eval of the phase-F best
# Each stage logs to /tmp/r3p_<stage>.log; failures don't break the chain.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  # block until jax sees a non-cpu device, up to WAIT_TPU_DEADLINE_S (default
  # 30 min) — then give up so the pipeline fails fast instead of spinning
  local deadline=$(( $(date +%s) + ${WAIT_TPU_DEADLINE_S:-1800} ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 300 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("TPU up:", d)
EOF
    then
      return 0
    fi
    sleep 60
  done
  echo "wait_tpu: deadline exceeded, skipping stage" >&2
  return 1
}

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}

echo "=== [1] student DAgger (tactile+seg+pcl) from $TEACHER $(date) ==="
if wait_tpu; then
  CKPT="$TEACHER" NUM_ENVS=256 timeout "${STUDENT_S:-4500}" bash scripts/train_s2.sh \
    task.env.tactile=True train.ppo.tactile_info=True \
    max_epochs=8000 output=outputs/student_r3 \
    > /tmp/r3p_student.log 2>&1
  echo "student rc=$? (124 = wall-clock cap)"
fi

echo "=== [2] student eval (first-episode, 256 envs) $(date) ==="
for SCK in outputs/student_r3/best_success.ckpt outputs/student_r3/last.ckpt; do
  if [ -f "$SCK" ] && wait_tpu; then
    CKPT="$TEACHER" STUDENT_CKPT="$SCK" NUM_ENVS=256 \
      timeout 2700 bash scripts/eval_s2.sh train.ppo.seg_info=True \
      noise_study=True > /tmp/r3p_evalS.log 2>&1 && break
  fi
done
grep -h "Success Rate" /tmp/r3p_evalS.log 2>/dev/null | tail -1

echo "=== [3] phase-F teacher (anchor-KL fine-tune) $(date) ==="
if wait_tpu; then
  timeout "${PHASE_F_S:-4500}" bash scripts/train_s1_anchor.sh \
    "$TEACHER" outputs/teacher_r3f \
    > /tmp/r3p_phaseF.log 2>&1
  echo "phase F rc=$? (124 = wall-clock cap, fine: bests banked during training)"
fi

echo "=== [4] authoritative eval of phase-F best $(date) ==="
BEST_F=outputs/teacher_r3f/best_success.ckpt
SR_F=0
if [ -f "$BEST_F" ] && wait_tpu; then
  timeout 2700 python train.py train.algo=PPO test=True num_envs=1024 eval_envs=1024 \
    checkpoint="$BEST_F" output=outputs/eval_r3f > /tmp/r3p_evalF.log 2>&1
  SR_F=$(grep -oP 'Success Rate: \K[0-9.]+' /tmp/r3p_evalF.log | tail -1)
  SR_F=${SR_F:-0}
fi
echo "phase-F authoritative success: $SR_F (banked r2b: 0.8428)"
echo "=== pipeline done $(date) ==="
