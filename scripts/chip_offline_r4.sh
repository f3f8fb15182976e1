#!/bin/bash
# Round-4 stretch stage (VERDICT r3 item 4): offline student to convergence
# + live-env replay eval (offline_training_w_env parity, reference
# train.py:124-128). The round-3 trajectory set did not survive the round
# boundary, so this regenerates a (smaller) deterministic collection first.
# BANK-IMMEDIATELY: terminal artifacts copied into checkpoints/offline_r4.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/offline_r4

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}

echo "=== [7a] collect teacher rollouts (pcl sensors on) $(date) ==="
CKPT="$TEACHER" NUM_ENVS=${NUM_ENVS:-256} TRAJS=${TRAJS:-1200} \
  DATA=outputs/traj_r4 timeout "${COLLECT_S:-1500}" bash scripts/collect_s1.sh \
  pcl_cam=True seg_cam=True depth_cam=True > /tmp/r4p_collect.log 2>&1
echo "collect rc=$? ($(ls outputs/traj_r4 2>/dev/null | wc -l) files)"

echo "=== [7b] offline student (obs+pcl only-BC) to plateau + replay eval $(date) ==="
DATA=outputs/traj_r4 OUT=outputs/offline_r4 EPOCHS=${EPOCHS:-40} PCL=True \
  timeout "${OFFLINE_S:-2400}" bash scripts/train_offline.sh \
  only_bc=True offline_training_w_env=True num_envs=256 \
  teacher_checkpoint="$TEACHER" > /tmp/r4p_offline.log 2>&1
echo "offline rc=$?"
grep -h "val/loss\|offline training done\|Replay Success Rate" /tmp/r4p_offline.log | tail -8

for f in outputs/offline_r4/metrics.jsonl outputs/offline_r4/best_success.ckpt \
         outputs/offline_r4/last.ckpt; do
  [ -e "$f" ] && cp -r "$f" checkpoints/offline_r4/ && echo "banked $f"
done
echo "=== offline stage done $(date) ==="
