#!/usr/bin/env python
"""PBT sweep launcher (reference pbt/launcher/run_processes.py parity).

Single-host: in-process population (isaacgyminsertion_tpu.pbt.driver).
Multi-host: run this per host with POLICY_OFFSET, sharing WORKSPACE.

Env knobs (round-5 fine-tune-sweep use case, VERDICT r4 item 3b):
  RESTORE         teacher checkpoint every member starts from
  LR_SPREAD       comma-separated per-member initial learning rates
  EVAL_OBJECTIVE  1 = PBT objective is a real full-episode eval
                  (EVAL_ENVS envs, reference test=True convention)
  MUTABLE         comma list of mutable hparams (default learning_rate only
                  when RESTORE is set: lr mutates recompile-free on chip)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from isaacgyminsertion_tpu.algo.ppo import PPOConfig
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.pbt.driver import run_pbt_population
from isaacgyminsertion_tpu.pbt.pbt import PbtParams
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

cfg_task = default_task_config()
model = build_kuka_openhand()
subs = build_subassembly_set()
restore = os.environ.get("RESTORE") or None
lr_spread = ([float(x) for x in os.environ["LR_SPREAD"].split(",")]
             if os.environ.get("LR_SPREAD") else None)
mutable = tuple(os.environ.get(
    "MUTABLE", "learning_rate" if restore else "learning_rate,e_clip,grad_norm"
).split(","))

ppo_cfg = PPOConfig(horizon=int(os.environ.get("HORIZON", 64)))
if restore:
    # fine-tune population: train on the full task (fail resets on), like
    # the r2b phase-B recipe the checkpoint came from
    import dataclasses
    cfg_task = cfg_task.replace(reset_at_fails=True)

eval_fn = None
if os.environ.get("EVAL_OBJECTIVE", "0") == "1":
    import dataclasses as _dc

    from isaacgyminsertion_tpu.algo.trainer import make_eval_fn
    from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit

    eval_cfg = cfg_task.replace(
        reset_at_fails=False, reset_at_success=False,
        randomize=_dc.replace(cfg_task.randomize, clearance_curriculum_extra=0.0))
    net = ActorCriticSplit(
        num_actions=cfg_task.env.num_actions,
        obs_dim=cfg_task.env.num_obs_hist * cfg_task.env.num_observations,
        priv_dim=cfg_task.env.num_states,
    )
    eval_fn = make_eval_fn(eval_cfg, model, subs, net,
                           int(os.environ.get("EVAL_ENVS", 256)))

members = run_pbt_population(
    cfg_task, ppo_cfg, model, subs,
    n_envs=int(os.environ.get("NUM_ENVS", 512)),
    pbt_params=PbtParams(num_policies=int(os.environ.get("POLICIES", 4)),
                         workspace=os.environ.get("WORKSPACE", "outputs/pbt"),
                         interval_steps=float(os.environ.get("INTERVAL_STEPS", 1e7)),
                         start_after_steps=float(os.environ.get("START_AFTER", 1e7)),
                         initial_delay_steps=float(os.environ.get("INITIAL_DELAY", 2e7))),
    epochs_per_interval=int(os.environ.get("EPOCHS_PER_INTERVAL", 20)),
    intervals=int(os.environ.get("INTERVALS", 50)),
    policy_offset=int(os.environ.get("POLICY_OFFSET", 0)),
    local_policies=(int(os.environ["LOCAL_POLICIES"])
                    if "LOCAL_POLICIES" in os.environ else None),
    restore=restore,
    lr_spread=lr_spread,
    eval_fn=eval_fn,
    mutable_hparams=mutable,
)
print("final objectives:", [m["objective"] for m in members])

# export the global best as a standard checkpoint (train.py test=True-able):
# PbtMember.weights already uses the Checkpointer key layout
import pickle

ws = os.environ.get("WORKSPACE", "outputs/pbt")
best_path = os.path.join(ws, "best.pbt")
if os.path.exists(best_path):
    with open(best_path, "rb") as f:
        best = pickle.load(f)
    out = os.path.join(ws, "best_success.ckpt")
    with open(out, "wb") as f:
        pickle.dump(jax.device_get(best.weights), f)
    print(f"pbt global best: policy {best.policy_idx} "
          f"objective {best.true_objective:.4f} -> {out}")
