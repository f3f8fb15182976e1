#!/bin/bash
# Round-2 chip pipeline v2 — serializes every TPU job for this round with a
# TPU-availability wait BEFORE EACH STAGE (the shared axon pool comes and
# goes; v1 only waited once at the start):
#   1. north-star sensors-on bench (bench.py)
#   2. phase-F teacher fine-tune (anchor-KL + anneal ladder), wall-clock capped
#   3. authoritative 1024-env eval of the phase-F best
#   4. pick the best teacher (phase F vs banked teacher_r2b) for stage 2
#   5. student DAgger (tactile+seg+pcl) from the best teacher, capped
#   6. student-driven eval
# Each stage logs to /tmp/r2p_<stage>.log; failures don't break the chain.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  # block until jax sees a non-cpu device; no overall cap (caller monitors)
  while true; do
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
}

echo "=== [1] bench (sensors-on north star) $(date) ==="
wait_tpu
timeout 2400 python bench.py 2>/tmp/r2p_bench.err | tee /tmp/bench_r2_northstar.json

echo "=== [2] phase-F teacher $(date) ==="
wait_tpu
timeout "${PHASE_F_S:-9000}" bash scripts/train_s1_anchor.sh \
  checkpoints/teacher_r2b/best_success.ckpt outputs/teacher_r2f \
  > /tmp/r2p_phaseF.log 2>&1
echo "phase F rc=$? (124 = wall-clock cap, fine: bests banked during training)"

echo "=== [3] authoritative eval of phase-F best $(date) ==="
BEST_F=outputs/teacher_r2f/best_success.ckpt
SR_F=0
if [ -f "$BEST_F" ]; then
  wait_tpu
  timeout 2400 python train.py train.algo=PPO test=True num_envs=1024 eval_envs=1024 \
    checkpoint="$BEST_F" > /tmp/r2p_evalF.log 2>&1
  SR_F=$(grep -oP 'Success Rate: \K[0-9.]+' /tmp/r2p_evalF.log | tail -1)
  SR_F=${SR_F:-0}
fi
echo "phase-F authoritative success: $SR_F (banked r2b: 0.8428)"

TEACHER=checkpoints/teacher_r2b/best_success.ckpt
if python -c "import sys; sys.exit(0 if float('$SR_F') > 0.8428 else 1)"; then
  TEACHER="$BEST_F"
fi
echo "$TEACHER $SR_F" > /tmp/best_teacher.txt
echo "stage-2 teacher: $TEACHER"

echo "=== [5] student DAgger (tactile+seg+pcl) $(date) ==="
wait_tpu
CKPT="$TEACHER" NUM_ENVS=256 timeout "${STUDENT_S:-10800}" bash scripts/train_s2.sh \
  task.env.tactile=True train.ppo.tactile_info=True \
  max_epochs=6000 output=outputs/student_r2 \
  > /tmp/r2p_student.log 2>&1
echo "student rc=$? (124 = wall-clock cap)"

echo "=== [6] student eval $(date) ==="
wait_tpu
CKPT="$TEACHER" STUDENT_CKPT=outputs/student_r2/best_success.ckpt NUM_ENVS=64 \
  timeout 2400 bash scripts/eval_s2.sh > /tmp/r2p_evalS.log 2>&1 \
  || CKPT="$TEACHER" STUDENT_CKPT=outputs/student_r2/last.ckpt NUM_ENVS=64 \
     timeout 2400 bash scripts/eval_s2.sh > /tmp/r2p_evalS.log 2>&1
grep -h "Success Rate" /tmp/r2p_evalS.log | tail -1
echo "=== pipeline done $(date) ==="
