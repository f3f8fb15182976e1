#!/bin/bash
# Teacher PPO (stage 1) — reference scripts/train_s1.sh recipe
python train.py task=FactoryTaskInsertionTactile train.algo=PPO \
  task.env.numEnvs=${NUM_ENVS:-4096} \
  train.ppo.horizon_length=64 train.ppo.mini_epochs=8 \
  output=outputs/teacher "$@"
