#!/bin/bash
# Phase-3 student restore: freeze all but the decoder (reference scripts/train_s3.sh)
python train.py train.algo=ExtrinsicAdapt checkpoint=${CKPT:-outputs/teacher/best_success} \
  student_checkpoint=${STUDENT:-outputs/student/last} phase3=True \
  task.env.numEnvs=${NUM_ENVS:-256} output=outputs/student_p3 "$@"
