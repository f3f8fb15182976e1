#!/bin/bash
# Tactile-only student — reference train_s2.sh tactile variant
python train.py train.algo=ExtrinsicAdapt checkpoint=${CKPT:-outputs/teacher/best_success} \
  task.env.numEnvs=${NUM_ENVS:-256} task.env.tactile=True train.ppo.tactile_info=True \
  output=outputs/student_tactile "$@"
