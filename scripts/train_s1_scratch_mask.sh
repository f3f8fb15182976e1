#!/bin/bash
# Stage-1 teacher, round-5 phase A-mask (VERDICT r4 item 3a): FROM SCRATCH
# with the corrected success-timeout bootstrap active from step 0.
# Rationale: applying bootstrap_mask_success to a RESTORED converged teacher
# destroyed it twice (G1 acute, G2 with 20M critic warmup slower — both
# collapse because the inherited critic overvalues success states vs the
# masked targets). From scratch there is no inherited critic: if the round-3
# diagnosis is right (self-referential success bootstrap inflates
# value_error_success 4x and turns adv_success negative at the peak), this
# run should show value_error_success ~ value_error_fail and collapse less
# after its peak than the unmasked r2a baseline did.
# Recipe otherwise = round-2 phase A (from scratch, reset_at_fails=False,
# entropy 3e-3, anneal ladder), the best-known from-scratch configuration.
OUT=${1:-outputs/teacher_r5a}

python train.py train.algo=PPO \
  num_envs=${NUM_ENVS:-1024} eval_envs=${EVAL_ENVS:-1024} seed=${SEED:-7} \
  task.reset_at_fails=False \
  output="$OUT" \
  train.ppo.entropy_coef=3e-3 \
  train.ppo.bootstrap_mask_success=True \
  train.ppo.anneal_ladder=True \
  train.ppo.anneal_patience=2 \
  train.ppo.anneal_decay=0.5 \
  train.ppo.max_agent_steps=${MAX_STEPS:-6.0e8} \
  eval_freq_steps=${EVAL_FREQ:-10e6} \
  "${@:2}"
