#!/bin/bash
# Online student distillation (stage 2) — the reference's shipped recipe
# (reference scripts/train_s2.sh): offline_train.only_bc=True with
# obs_info+pcl_info as the ONLY student inputs (tactile/img/seg student
# inputs OFF; seg_cam stays on because the point-cloud assembly needs the
# segmentation channel), reset_at_success+reset_at_fails+rand_inits during
# training. Round 3 silently trained a harder config (tactile+seg+pcl,
# latent-injection) — this now defaults to reference parity; pass overrides
# for the harder variants.
python train.py train.algo=ExtrinsicAdapt checkpoint=${CKPT:-outputs/teacher/best_success} \
  task.env.numEnvs=${NUM_ENVS:-256} \
  task.external_cam.external_cam=True task.external_cam.seg_cam=True task.external_cam.pcl_cam=True \
  train.ppo.obs_info=True train.ppo.pcl_info=True \
  train.ppo.only_bc=${ONLY_BC:-True} \
  task.reset_at_success=True task.reset_at_fails=True task.rand_inits=True \
  task.env.render_capacity=${RENDER_CAPACITY:-0.75} \
  output=outputs/student "$@"
