#!/bin/bash
# Round-3 second chip run — after the tactile-noise NaN fix (render_pallas).
# The first pipeline's student stage trained on 50%-NaN tactile images and
# banked garbage (outputs/student_r3_nan); this rerun executes the remaining
# round-3 evidence items in VERDICT priority order, student first:
#   1. student DAgger (tactile+seg+pcl) from the banked best teacher
#   2. student-driven first-episode eval @256 + pcl-noise robustness study
#   3. collect sensor trajectories + offline multimodal student (VERDICT #8)
#   4. perf profiles @8192 (VERDICT #7)
#   5. phase-F teacher anchor-KL fine-tune + authoritative eval (VERDICT #3)
# Bounded stages, deadlined TPU wait; failures don't break the chain.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  local deadline=$(( $(date +%s) + ${WAIT_TPU_DEADLINE_S:-1800} ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 300 python -c 'import jax; d=jax.devices(); assert d and d[0].platform!="cpu"; print("TPU up:", d)'; then
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
  CKPT="$TEACHER" NUM_ENVS=256 timeout "${STUDENT_S:-4800}" bash scripts/train_s2.sh \
    task.env.tactile=True train.ppo.tactile_info=True \
    max_epochs=8000 output=outputs/student_r3 \
    > /tmp/r3b_student.log 2>&1
  echo "student rc=$? (124 = wall-clock cap)"
fi

echo "=== [2] student eval (first-episode, 256 envs) + noise study $(date) ==="
for SCK in outputs/student_r3/best_success.ckpt outputs/student_r3/last.ckpt; do
  if [ -f "$SCK" ] && wait_tpu; then
    CKPT="$TEACHER" STUDENT_CKPT="$SCK" NUM_ENVS=256 \
      timeout 3600 bash scripts/eval_s2.sh train.ppo.seg_info=True \
      noise_study=True > /tmp/r3b_evalS.log 2>&1 && break
  fi
done
grep -h "Success Rate\|noise_study" /tmp/r3b_evalS.log 2>/dev/null | tail -6

echo "=== [3a] collect (sensors on) $(date) ==="
if wait_tpu; then
  CKPT="$TEACHER" DATA=outputs/traj_r3 NUM_ENVS=32 TRAJS=${TRAJS:-64} \
    timeout "${COLLECT_S:-1800}" bash scripts/collect_s1.sh \
    tactile=True seg_cam=True pcl_cam=True \
    > /tmp/r3b_collect.log 2>&1
  echo "collect rc=$?"
fi

echo "=== [3b] offline multimodal student $(date) ==="
if [ -d outputs/traj_r3 ] && wait_tpu; then
  DATA=outputs/traj_r3 OUT=outputs/offline_r3 EPOCHS=${EPOCHS:-12} \
    TACTILE=True SEG=True PCL=True \
    timeout "${OFFLINE_S:-2400}" bash scripts/train_offline.sh \
    > /tmp/r3b_offline.log 2>&1
  echo "offline rc=$?"
  grep -iE "held|val|best" /tmp/r3b_offline.log | tail -5
fi

echo "=== [4] perf profiles @8192 $(date) ==="
if wait_tpu; then
  timeout 1800 python tools/profile_sensors.py 8192 > /tmp/r3b_prof_sensors.log 2>&1
  echo "profile_sensors rc=$?"; tail -20 /tmp/r3b_prof_sensors.log
  timeout 1800 python tools/profile_physics.py > /tmp/r3b_prof_physics.log 2>&1
  echo "profile_physics rc=$?"; tail -20 /tmp/r3b_prof_physics.log
fi

echo "=== [5] phase-F teacher (anchor-KL fine-tune) $(date) ==="
if wait_tpu; then
  timeout "${PHASE_F_S:-4500}" bash scripts/train_s1_anchor.sh \
    "$TEACHER" outputs/teacher_r3f \
    > /tmp/r3b_phaseF.log 2>&1
  echo "phase F rc=$? (124 = wall-clock cap, fine: bests banked during training)"
fi

echo "=== [6] authoritative eval of phase-F best $(date) ==="
BEST_F=outputs/teacher_r3f/best_success.ckpt
SR_F=0
if [ -f "$BEST_F" ] && wait_tpu; then
  timeout 2700 python train.py train.algo=PPO test=True num_envs=1024 eval_envs=1024 \
    checkpoint="$BEST_F" output=outputs/eval_r3f > /tmp/r3b_evalF.log 2>&1
  SR_F=$(grep -oP 'Success Rate: \K[0-9.]+' /tmp/r3b_evalF.log | tail -1)
  SR_F=${SR_F:-0}
fi
echo "phase-F authoritative success: $SR_F (banked r2b: 0.8428)"
echo "=== r3b chip run done $(date) ==="
