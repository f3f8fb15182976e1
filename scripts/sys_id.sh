#!/bin/bash
# Sim-parameter system identification (reference scripts/sys_id.sh)
python -c "
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from isaacgyminsertion_tpu.sysid import optimize_sim_params
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
rec = dict(np.load('${TRAJ:?set TRAJ=<recorded npz>}'))
recorded = {'actions': rec['actions'], 'plug_pos': rec['plug_pos'], 'plug_quat': rec['plug_quat']}
best, hist = optimize_sim_params(default_task_config(), build_kuka_openhand(),
                                 build_subassembly_set(), recorded, n_trials=int('${TRIALS:-50}'))
print('best sim params:', best)
"
