#!/bin/bash
# Online student distillation (stage 2) — reference scripts/train_s2.sh recipe
python train.py train.algo=ExtrinsicAdapt checkpoint=${CKPT:-outputs/teacher/best_success} \
  task.env.numEnvs=${NUM_ENVS:-256} \
  task.external_cam.external_cam=True task.external_cam.seg_cam=True task.external_cam.pcl_cam=True \
  train.ppo.pcl_info=True train.ppo.seg_info=True \
  task.env.render_capacity=${RENDER_CAPACITY:-0.75} \
  output=outputs/student "$@"
