#!/bin/bash
# Teacher evaluation — reference scripts/eval_s1.sh recipe
python train.py train.algo=PPO test=True checkpoint=${CKPT:-outputs/teacher/best_success} \
  task.env.numEnvs=${NUM_ENVS:-64} "$@"
