#!/bin/bash
# Offline student training (reference scripts/train_offline.sh).
# Multimodal: pass tactile_info=True pcl_info=True seg_info=True img_info=True
# to train from the sensor side arrays recorded by collect_s1.sh (which takes
# the matching tactile=True pcl_cam=True ... flags), and
# teacher_checkpoint=<dir> for frozen-teacher action regularization.
python train_supervised.py data_dir=${DATA:-outputs/trajectories} \
  output=${OUT:-outputs/offline} epochs=${EPOCHS:-10} \
  tactile_info=${TACTILE:-False} pcl_info=${PCL:-False} \
  seg_info=${SEG:-False} img_info=${IMG:-False} "$@"
