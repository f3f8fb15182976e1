#!/bin/bash
# Stage-1 teacher, round-5 phase B-mask: fine-tune the phase-A-mask best with
# fail resets ON (full task), mask still active. No restored-critic mismatch
# here: the critic was TRAINED under masked targets, so this is the r2a->r2b
# ladder with the corrected bootstrap throughout.
CKPT=${1:?phase-A-mask checkpoint}
OUT=${2:-outputs/teacher_r5b}

python train.py train.algo=PPO \
  num_envs=${NUM_ENVS:-1024} eval_envs=${EVAL_ENVS:-1024} seed=${SEED:-42} \
  task.reset_at_fails=True \
  checkpoint="$CKPT" \
  output="$OUT" \
  train.ppo.learning_rate=${LR:-1e-4} \
  train.ppo.bootstrap_mask_success=True \
  train.ppo.anneal_ladder=True \
  train.ppo.anneal_patience=2 \
  train.ppo.anneal_decay=0.5 \
  train.ppo.anneal_min_lr=1.25e-5 \
  train.ppo.max_agent_steps=${MAX_STEPS:-6.0e8} \
  eval_freq_steps=${EVAL_FREQ:-10e6} \
  "${@:3}"
