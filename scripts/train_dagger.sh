#!/bin/bash
# Replay an OFFLINE-trained student against the live env (reference
# scripts/train_dagger.sh: offline_training_w_env=True — validates the
# offline checkpoint online before/while continuing DAgger).
# The offline checkpoint ({"student_params": ...}) restores directly into the
# online DAgger trainer; test=True evaluates it, drop test=True to continue
# training it online.
python train.py train.algo=ExtrinsicAdapt test=True \
  checkpoint=${CKPT:-outputs/teacher/best_success} \
  student_checkpoint=${STUDENT_CKPT:-outputs/offline/last} \
  task.env.numEnvs=${NUM_ENVS:-64} \
  task.env.tactile=True task.external_cam.external_cam=True \
  train.ppo.tactile_info=True train.ppo.obs_info=True \
  "$@"
