#!/bin/bash
# Round-3 follow-up chip stage (runs after chip_pipeline_r3.sh):
#   1. collect teacher rollouts WITH sensor side arrays (tactile+seg+pcl)
#   2. offline multimodal student training on the collected set (held-out
#      by-trajectory split) — VERDICT r2 #8 (runner.py:194-304 parity)
#   3. perf profiles at 8192 (physics + sensors) — VERDICT r2 #7
# Bounded stages, same deadlined wait as pipeline r3.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  local deadline=$(( $(date +%s) + ${WAIT_TPU_DEADLINE_S:-900} ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 300 python -c 'import jax; d=jax.devices(); assert d and d[0].platform!="cpu"'; then
      return 0
    fi
    sleep 30
  done
  return 1
}

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}

echo "=== [1] collect (sensors on) $(date) ==="
if wait_tpu; then
  # train_supervised.py's collect path takes bare modality flags
  CKPT="$TEACHER" DATA=outputs/traj_r3 NUM_ENVS=32 TRAJS=${TRAJS:-64} \
    timeout "${COLLECT_S:-1800}" bash scripts/collect_s1.sh \
    tactile=True seg_cam=True pcl_cam=True \
    > /tmp/r3f_collect.log 2>&1
  echo "collect rc=$?"
fi

echo "=== [2] offline multimodal student $(date) ==="
if [ -d outputs/traj_r3 ] && wait_tpu; then
  DATA=outputs/traj_r3 OUT=outputs/offline_r3 EPOCHS=${EPOCHS:-12} \
    TACTILE=True SEG=True PCL=True \
    timeout "${OFFLINE_S:-2400}" bash scripts/train_offline.sh \
    > /tmp/r3f_offline.log 2>&1
  echo "offline rc=$?"
  grep -iE "held|val|best" /tmp/r3f_offline.log | tail -5
fi

echo "=== [3] perf profiles @8192 $(date) ==="
if wait_tpu; then
  timeout 1500 python tools/profile_sensors.py 8192 > /tmp/r3f_prof_sensors.log 2>&1
  echo "profile_sensors rc=$?"; tail -20 /tmp/r3f_prof_sensors.log
  timeout 1500 python tools/profile_physics.py > /tmp/r3f_prof_physics.log 2>&1
  echo "profile_physics rc=$?"; tail -20 /tmp/r3f_prof_physics.log
fi
echo "=== follow-up done $(date) ==="
