#!/bin/bash
# Offline student training (reference scripts/train_offline.sh)
python train_supervised.py data_dir=${DATA:-outputs/trajectories} \
  output=${OUT:-outputs/offline} epochs=${EPOCHS:-10} "$@"
