#!/bin/bash
# Student-distillation triage (b): privileged-input upper-bound control
# (VERDICT r3 item 1b; diagnostic, no reference counterpart).
#
# Distill a student whose input is obs + the normalized privileged vector
# itself through the SAME DAgger trainer (same β anneal, same loss, same
# eval). If THIS student cannot reach teacher-level success, the DAgger loop
# is the bug; if it can, the loop is sound and any remaining gap for the
# sensor student is perception.
python train.py train.algo=ExtrinsicAdapt \
  checkpoint=${CKPT:-checkpoints/teacher_r2b/best_success.ckpt} \
  num_envs=${NUM_ENVS:-1024} \
  train.ppo.obs_info=True train.ppo.use_priv=True train.ppo.only_bc=True \
  task.reset_at_success=True task.reset_at_fails=True task.rand_inits=True \
  eval_envs=${EVAL_ENVS:-256} \
  max_epochs=${MAX_EPOCHS:-160} \
  output=${OUT:-outputs/student_r4_privctl} "$@"
