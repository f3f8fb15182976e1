"""In-process PBT population driver over the jitted PPO trainer.

The reference runs one process per policy and exec-restarts on replacement
(pbt/pbt.py:123-178, launcher/run_processes.py). Here a single host drives the
whole population round-robin — each member's weights/hparams live in host
memory and swap as pytrees — while the same filesystem workspace protocol
(pbt.py checkpoints) still interoperates with process-per-policy launches on
other hosts (multi-host sweeps share only the workspace directory).

Round-5 additions (first real-scale exercise, VERDICT r4 item 3b):
  - `restore`: seed every member from a banked teacher checkpoint (the
    fine-tune-sweep use case: population around teacher_r2b);
  - `lr_spread`: per-member initial learning rates so a seeded population is
    diverse from interval 0 (otherwise all members are identical and the
    replacement machinery has nothing to select on);
  - learning-rate mutations are applied through the optimizer's
    inject_hyperparams slot instead of a rebuild, so they cost zero
    recompiles on chip (other hparam mutations still rebuild);
  - `eval_fn`: optional real evaluation objective (full-episode success via
    trainer.make_eval_fn) replacing the noisy in-train per-step success —
    the number PBT selects on is then the number that counts;
  - per-interval JSONL telemetry into the workspace.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..algo import ppo as ppo_mod
from .pbt import PbtMember, PbtParams, pbt_update

MUTABLE_HPARAMS = ("learning_rate", "e_clip", "grad_norm")


def _set_member_lr(m, lr: float):
    """Write lr into the inject_hyperparams slot (no recompile)."""
    opt_state = m["state"].opt_state
    inj = opt_state[1]
    hp = dict(inj.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    m["state"] = m["state"]._replace(
        opt_state=(opt_state[0], inj._replace(hyperparams=hp)) + tuple(opt_state[2:])
    )


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
    restore: str | None = None,
    lr_spread: list[float] | None = None,
    eval_fn=None,
    mutable_hparams: tuple = MUTABLE_HPARAMS,
):
    """Round-robin PBT over the local member slice; returns the members.

    Objective = `eval_fn(params, obs_rms, priv_rms, rng)` when given (real
    full-episode success), else windowed mean episode success (falls back to
    reward early in training), matching the reference's true_objective choice.

    Multi-host partitioning (reference run_slurm.py/run_processes.py parity):
    `pbt_params.num_policies` is the TOTAL population; this process trains
    `local_policies` members with global indices policy_offset..+local-1 and
    exchanges checkpoints with the rest through the shared workspace.
    """
    num = local_policies if local_policies is not None else pbt_params.num_policies
    # force the inject_hyperparams optimizer so lr mutations are data, not
    # recompiles (ppo.build selects it when anneal_ladder is set; the ladder
    # itself lives in PPOTrainer and is not active here)
    base_ppo_cfg = base_ppo_cfg.replace(anneal_ladder=True)
    restored = None
    if restore:
        from ..utils.checkpoint import restore_path

        restored = restore_path(restore)
    os.makedirs(pbt_params.workspace, exist_ok=True)
    log_path = os.path.join(pbt_params.workspace, "pbt_log.jsonl")

    members = []
    for i in range(num):
        hp = {k: getattr(base_ppo_cfg, k) for k in mutable_hparams}
        if lr_spread:
            hp["learning_rate"] = float(lr_spread[i % len(lr_spread)])
        cfg = base_ppo_cfg.replace(**hp)
        net, tx, state, train_epoch = ppo_mod.build(
            cfg_task, cfg, model, subs, n_envs,
            jax.random.PRNGKey(seed + policy_offset + i)
        )
        if restored is not None:
            state = state._replace(
                params=restored["params"], obs_rms=restored["obs_rms"],
                priv_rms=restored["priv_rms"], value_rms=restored["value_rms"],
            )
        members.append(dict(
            hparams=hp, cfg=cfg, state=state,
            train_epoch=jax.jit(train_epoch), objective=0.0,
            steps_since_restart=0.0, iteration=0,
        ))

    def rebuild(m, new_hp):
        """Apply mutated hparams: lr via injection (free); anything else via
        a build (recompile)."""
        old_hp = m["hparams"]
        non_lr_changed = any(
            k != "learning_rate" and new_hp[k] != old_hp.get(k) for k in new_hp
        )
        m["hparams"] = new_hp
        if not non_lr_changed:
            m["cfg"] = m["cfg"].replace(learning_rate=new_hp["learning_rate"])
            _set_member_lr(m, new_hp["learning_rate"])
            return
        cfg = base_ppo_cfg.replace(**new_hp)
        _, tx, _, train_epoch = ppo_mod.build(
            cfg_task, cfg, model, subs, n_envs, jax.random.PRNGKey(0)
        )
        m["cfg"] = cfg
        m["train_epoch"] = jax.jit(train_epoch)
        m["state"] = m["state"]._replace(opt_state=tx.init(m["state"].params))
        _set_member_lr(m, new_hp["learning_rate"])

    for i, m in enumerate(members):
        if lr_spread:
            _set_member_lr(m, m["hparams"]["learning_rate"])

    for interval in range(intervals):
        for idx, m in enumerate(members):
            t0 = time.perf_counter()
            rewards, succ = [], []
            for _ in range(epochs_per_interval):
                m["state"], metrics = m["train_epoch"](m["state"])
                rewards.append(float(metrics["episode/reward"]))
                succ.append(float(metrics["episode/success"]))
            m["steps_since_restart"] += epochs_per_interval * m["cfg"].horizon * n_envs
            m["iteration"] += 1
            if eval_fn is not None:
                m["objective"] = float(eval_fn(
                    m["state"].params, m["state"].obs_rms, m["state"].priv_rms,
                    jax.random.PRNGKey(1000 * interval + idx)))
            else:
                m["objective"] = (float(np.mean(succ)) if np.mean(succ) > 0
                                  else float(np.mean(rewards)))

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
            with open(log_path, "a") as f:
                f.write(json.dumps({
                    "interval": interval, "policy": gidx,
                    "objective": m["objective"], "hparams": m["hparams"],
                    "replaced": bool(replaced),
                    "agent_steps": float(m["state"].agent_steps),
                    "train_success_mean": float(np.mean(succ)),
                    "secs": round(time.perf_counter() - t0, 1),
                }) + "\n")
            if replaced and new_weights is not None:
                m["state"] = m["state"]._replace(
                    params=new_weights["params"], obs_rms=new_weights["obs_rms"],
                    priv_rms=new_weights["priv_rms"], value_rms=new_weights["value_rms"],
                )
                m["steps_since_restart"] = 0.0
            if new_hp != m["hparams"]:
                rebuild(m, new_hp)
            print(f"[pbt] interval {interval} policy {gidx} "
                  f"obj={m['objective']:.4f} hp={m['hparams']} "
                  f"replaced={replaced}", flush=True)
    return members
