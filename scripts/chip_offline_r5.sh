#!/bin/bash
# Round-5 (VERDICT r4 item 4): offline student to convergence + live-env
# replay eval. Deterministic regeneration (collect is seeded + writes
# manifest.json); normalization stats + manifest are BANKED with the result.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/offline_r5

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}

echo "=== [a] collect teacher rollouts (pcl sensors on) $(date) ==="
CKPT="$TEACHER" NUM_ENVS=${NUM_ENVS:-256} TRAJS=${TRAJS:-1200} \
  DATA=outputs/traj_r5 timeout "${COLLECT_S:-2400}" bash scripts/collect_s1.sh \
  pcl_cam=True seg_cam=True depth_cam=True > /tmp/r5_collect.log 2>&1
echo "collect rc=$? ($(ls outputs/traj_r5 2>/dev/null | wc -l) files)"
for f in outputs/traj_r5/manifest.json; do
  [ -s "$f" ] && cp "$f" checkpoints/offline_r5/ && echo "banked $f"
done

echo "=== [b] offline student (obs+pcl only-BC) to plateau + replay eval $(date) ==="
DATA=outputs/traj_r5 OUT=outputs/offline_r5 EPOCHS=${EPOCHS:-60} PCL=True \
  timeout "${OFFLINE_S:-3600}" bash scripts/train_offline.sh \
  only_bc=True offline_training_w_env=True num_envs=256 \
  teacher_checkpoint="$TEACHER" > /tmp/r5_offline.log 2>&1
echo "offline rc=$?"
grep -h "val/loss\|offline training done\|Replay Success Rate" /tmp/r5_offline.log | tail -8

for f in outputs/offline_r5/metrics.jsonl outputs/offline_r5/best_success.ckpt \
         outputs/offline_r5/last.ckpt outputs/traj_r5/normalization.pkl; do
  [ -s "$f" ] && cp -r "$f" checkpoints/offline_r5/ && echo "banked $f"
done
tail -40 /tmp/r5_offline.log > checkpoints/offline_r5/offline_log_tail.log
echo "=== offline stage done $(date) ==="
