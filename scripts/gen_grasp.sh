#!/bin/bash
# Grasp dataset generation (reference scripts/gen_grasp.sh)
python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
from isaacgyminsertion_tpu.envs.grasp_gen import generate_grasp_dataset
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
import os
os.makedirs('outputs', exist_ok=True)
n = generate_grasp_dataset(default_task_config(), build_kuka_openhand(),
                           build_subassembly_set(), n_envs=int('${NUM_ENVS:-256}'),
                           n_rounds=int('${ROUNDS:-8}'), out_path='outputs/initial_grasp_data.npz')
print(f'{n} grasp rows -> outputs/initial_grasp_data.npz')
"
