#!/bin/bash
# Plug-rotation tactile data collection (reference scripts/collect_rotate.sh)
python train.py collect_rotate=True task.env.numEnvs=${NUM_ENVS:-32} output=${OUT:-outputs/tactile_rot} "$@"
