"""In-process PBT population driver over the jitted PPO trainer.

The reference runs one process per policy and exec-restarts on replacement
(pbt/pbt.py:123-178, launcher/run_processes.py). Here a single host drives the
whole population round-robin — each member's weights/hparams live in host
memory and swap as pytrees — while the same filesystem workspace protocol
(pbt.py checkpoints) still interoperates with process-per-policy launches on
other hosts (multi-host sweeps share only the workspace directory).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..algo import ppo as ppo_mod
from .pbt import PbtMember, PbtParams, pbt_update, save_pbt_checkpoint

MUTABLE_HPARAMS = ("learning_rate", "e_clip", "grad_norm")


def run_pbt_population(
    cfg_task,
    base_ppo_cfg: ppo_mod.PPOConfig,
    model,
    subs,
    n_envs: int,
    pbt_params: PbtParams,
    epochs_per_interval: int = 4,
    intervals: int = 4,
    seed: int = 0,
    policy_offset: int = 0,
    local_policies: int | None = None,
):
    """Round-robin PBT over the local member slice; returns the members.

    Objective = windowed mean episode success (falls back to reward early in
    training), matching the reference's true_objective choice.

    Multi-host partitioning (reference run_slurm.py/run_processes.py parity):
    `pbt_params.num_policies` is the TOTAL population; this process trains
    `local_policies` members with global indices policy_offset..+local-1 and
    exchanges checkpoints with the rest through the shared workspace.
    """
    num = local_policies if local_policies is not None else pbt_params.num_policies
    members = []
    for i in range(num):
        hp = {k: getattr(base_ppo_cfg, k) for k in MUTABLE_HPARAMS}
        cfg = base_ppo_cfg.replace(**hp)
        net, tx, state, train_epoch = ppo_mod.build(
            cfg_task, cfg, model, subs, n_envs,
            jax.random.PRNGKey(seed + policy_offset + i)
        )
        members.append(dict(
            hparams=hp, cfg=cfg, state=state,
            train_epoch=jax.jit(train_epoch), objective=0.0,
            steps_since_restart=0.0, iteration=0,
        ))

    def rebuild(m, new_hp):
        cfg = base_ppo_cfg.replace(**new_hp)
        _, tx, _, train_epoch = ppo_mod.build(
            cfg_task, cfg, model, subs, n_envs, jax.random.PRNGKey(0)
        )
        m["cfg"] = cfg
        m["hparams"] = new_hp
        m["train_epoch"] = jax.jit(train_epoch)
        m["state"] = m["state"]._replace(opt_state=tx.init(m["state"].params))

    for interval in range(intervals):
        for idx, m in enumerate(members):
            rewards, succ = [], []
            for _ in range(epochs_per_interval):
                m["state"], metrics = m["train_epoch"](m["state"])
                rewards.append(float(metrics["episode/reward"]))
                succ.append(float(metrics["episode/success"]))
            m["steps_since_restart"] += epochs_per_interval * m["cfg"].horizon * n_envs
            m["iteration"] += 1
            m["objective"] = float(np.mean(succ)) if np.mean(succ) > 0 else float(np.mean(rewards))

            gidx = policy_offset + idx
            p = dataclasses.replace(pbt_params, policy_idx=gidx)
            me = PbtMember(
                policy_idx=gidx, iteration=m["iteration"],
                true_objective=m["objective"], hparams=m["hparams"],
                weights={"params": m["state"].params, "obs_rms": m["state"].obs_rms,
                         "priv_rms": m["state"].priv_rms, "value_rms": m["state"].value_rms},
            )
            new_hp, new_weights, replaced = pbt_update(
                p, me, m["steps_since_restart"], float(m["state"].agent_steps)
            )
            if replaced and new_weights is not None:
                m["state"] = m["state"]._replace(
                    params=new_weights["params"], obs_rms=new_weights["obs_rms"],
                    priv_rms=new_weights["priv_rms"], value_rms=new_weights["value_rms"],
                )
                m["steps_since_restart"] = 0.0
            if new_hp != m["hparams"]:
                rebuild(m, new_hp)
    return members
