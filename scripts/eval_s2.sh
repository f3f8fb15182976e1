#!/bin/bash
# Student (stage-2) evaluation with sensors on — reference scripts/eval_s2.sh:
# test=True train.algo=ExtrinsicAdapt with tactile+pcl modalities, restoring
# the stage-1 teacher (checkpoint=) and the trained student (student_checkpoint=).
python train.py train.algo=ExtrinsicAdapt test=True \
  checkpoint=${CKPT:-outputs/teacher/best_success} \
  student_checkpoint=${STUDENT_CKPT:-outputs/student/last} \
  task.env.numEnvs=${NUM_ENVS:-64} \
  task.env.tactile=True task.external_cam.external_cam=True \
  task.external_cam.seg_cam=True task.external_cam.pcl_cam=True \
  train.ppo.tactile_info=True train.ppo.pcl_info=True train.ppo.obs_info=True \
  task.reset_at_success=True task.reset_at_fails=True \
  "$@"
