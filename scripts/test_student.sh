#!/bin/bash
# Student evaluation (reference scripts/test_student.sh)
python train.py train.algo=PPO test=True checkpoint=${CKPT:-outputs/teacher/best_success} \
  task.env.numEnvs=${NUM_ENVS:-64} "$@"
