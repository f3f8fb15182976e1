#!/bin/bash
# Student (stage-2) evaluation with sensors on — reference scripts/eval_s2.sh:
# test=True train.algo=ExtrinsicAdapt with the trained modalities, restoring
# the stage-1 teacher (checkpoint=) and the trained student (student_checkpoint=).
# Reset flags are NOT set here: the student eval path applies the reference
# convention internally (reset_at_success=False, reset_at_fails=False —
# ext_adapt.py test(): the env may recover from a degrasp inside the episode).
python train.py train.algo=ExtrinsicAdapt test=True \
  checkpoint=${CKPT:-outputs/teacher/best_success} \
  student_checkpoint=${STUDENT_CKPT:-outputs/student/last} \
  task.env.numEnvs=${NUM_ENVS:-64} \
  task.external_cam.external_cam=True \
  task.external_cam.seg_cam=True task.external_cam.pcl_cam=True \
  train.ppo.pcl_info=True train.ppo.obs_info=True \
  train.ppo.only_bc=${ONLY_BC:-True} \
  "$@"
