#!/bin/bash
# Teacher rollout collection (reference scripts/collect_s1.sh)
python train_supervised.py collect=True checkpoint=${CKPT:-outputs/teacher/best_success} \
  data_dir=${DATA:-outputs/trajectories} num_envs=${NUM_ENVS:-16} \
  total_trajectories=${TRAJS:-1000} "$@"
