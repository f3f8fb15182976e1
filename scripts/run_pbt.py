#!/usr/bin/env python
"""PBT sweep launcher (reference pbt/launcher/run_processes.py parity).

Single-host: in-process population (isaacgyminsertion_tpu.pbt.driver).
Multi-host: run this per host with POLICY_OFFSET, sharing WORKSPACE.
"""
import os
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from isaacgyminsertion_tpu.algo.ppo import PPOConfig
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.pbt.driver import run_pbt_population
from isaacgyminsertion_tpu.pbt.pbt import PbtParams
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

members = run_pbt_population(
    default_task_config(), PPOConfig(horizon=int(os.environ.get("HORIZON", 64))),
    build_kuka_openhand(), build_subassembly_set(),
    n_envs=int(os.environ.get("NUM_ENVS", 512)),
    pbt_params=PbtParams(num_policies=int(os.environ.get("POLICIES", 4)),
                         workspace=os.environ.get("WORKSPACE", "outputs/pbt")),
    epochs_per_interval=int(os.environ.get("EPOCHS_PER_INTERVAL", 20)),
    intervals=int(os.environ.get("INTERVALS", 50)),
    policy_offset=int(os.environ.get("POLICY_OFFSET", 0)),
    local_policies=(int(os.environ["LOCAL_POLICIES"])
                    if "LOCAL_POLICIES" in os.environ else None),
)
print("final objectives:", [m["objective"] for m in members])
