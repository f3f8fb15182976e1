"""Hydra-style CLI (`key=value` overrides) — entry-point parity with
isaacgyminsertion/train.py (SURVEY.md §2.4).

The reference is driven as `python train.py task=FactoryTaskInsertionTactile
train.algo=PPO task.env.numEnvs=4096 ...` (scripts/*.sh); this module accepts
the same override grammar and maps the reference's yaml key names onto the
TaskConfig/PPOConfig/DAggerConfig dataclasses so the shell recipes translate
1:1.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any

from .algo.ext_adapt import DAggerConfig
from .algo.ppo import PPOConfig
from .envs.config import TaskConfig, default_task_config

# reference yaml name → (config object name, dataclass path)
_KEYMAP = {
    "task.env.numEnvs": ("num_envs", None),
    "num_envs": ("num_envs", None),
    "task.rl.max_episode_length": ("task", "rl.max_episode_length"),
    "task.env.tactile": ("task", "env.tactile"),
    "task.external_cam.external_cam": ("task", "env.external_cam"),
    "task.external_cam.depth_cam": ("task", "env.depth_cam"),
    "task.external_cam.seg_cam": ("task", "env.seg_cam"),
    "task.external_cam.pcl_cam": ("task", "env.pcl_cam"),
    "task.env.compute_contact_gt": ("task", "env.compute_contact_gt"),
    "task.randomize.domain_randomize": ("task", "randomize.domain_randomize"),
    "task.grasp_at_init": ("task", "grasp_at_init"),
    "task.reset_at_success": ("task", "reset_at_success"),
    "task.reset_at_fails": ("task", "reset_at_fails"),
    "task.rand_inits": ("task", "rand_inits"),
    # ctrl block (reference ctrl.ctrl_type selects among the 8 modes)
    "task.ctrl.ctrl_type": ("task", "ctrl_type"),
    "ctrl_type": ("task", "ctrl_type"),
    # env block camelCase names (FactoryTaskInsertionTactile.yaml:35-115)
    "task.env.numObservations": ("task", "env.num_observations"),
    "task.env.numObsStudent": ("task", "env.num_obs_student"),
    "task.env.numStates": ("task", "env.num_states"),
    "task.env.numActions": ("task", "env.num_actions"),
    "task.env.numObsHist": ("task", "env.num_obs_hist"),
    "task.env.numObsStudentHist": ("task", "env.num_obs_stud_hist"),
    "task.env.img_history_len": ("task", "env.img_history_len"),
    "task.env.tactile_history_len": ("task", "env.tactile_history_len"),
    "task.env.ft_history_len": ("task", "env.ft_history_len"),
    "task.env.smooth_force": ("task", "env.smooth_force"),
    "task.env.action_latency_max": ("task", "env.action_latency_max"),
    "task.env.actionLatencyMax": ("task", "env.action_latency_cur_max"),
    "task.env.actionLatencyScheduledSteps": ("task", "env.action_latency_scheduled_steps"),
    "task.env.actionDelayProbMax": ("task", "env.action_delay_prob_max"),
    "task.env.actionsMovingAverage.range": ("task", "env.actions_moving_average_range"),
    "task.env.actionsMovingAverage.schedule_steps": ("task", "env.actions_moving_average_schedule_steps"),
    "task.env.actionsMovingAverage.schedule_freq": ("task", "env.actions_moving_average_schedule_freq"),
    "task.env.plugObsDelayProb": ("task", "env.plug_obs_delay_prob"),
    "task.env.ImgDelayProb": ("task", "env.img_delay_prob"),
    "task.env.PclProbNoise": ("task", "env.pcl_prob_noise"),
    "task.env.SegDelayProb": ("task", "env.seg_delay_prob"),
    "task.env.SegProbNoise": ("task", "env.seg_prob_noise"),
    "task.env.TactileDelayProb": ("task", "env.tactile_delay_prob"),
    "task.env.scalePosProb": ("task", "env.scale_pos_prob"),
    "task.env.scaleRotProb": ("task", "env.scale_rot_prob"),
    "task.env.maxObjectSkipObs": ("task", "env.max_object_skip_obs"),
    "task.env.maxSkipImg": ("task", "env.max_skip_img"),
    "task.env.maxSkipTactile": ("task", "env.max_skip_tactile"),
    "task.env.actionEma": ("task", "env.action_ema"),
    "task.env.actionsMovingAverage.range": ("task", "env.actions_moving_average_range"),
    "task.env.actionsMovingAverage.schedule_steps": ("task", "env.actions_moving_average_schedule_steps"),
    "task.env.actionsMovingAverage.schedule_freq": ("task", "env.actions_moving_average_schedule_freq"),
    # randomization_params (envs/dr.py NoiseSpec fields)
    "task.randomize.randomization_params.frequency": ("task", "randomize.frequency"),
    "task.randomize.randomization_params.observations.range": ("task", "randomize.observations.range"),
    "task.randomize.randomization_params.observations.range_correlated": ("task", "randomize.observations.range_correlated"),
    "task.randomize.randomization_params.observations.schedule": ("task", "randomize.observations.schedule"),
    "task.randomize.randomization_params.observations.schedule_steps": ("task", "randomize.observations.schedule_steps"),
    "task.randomize.randomization_params.actions.range": ("task", "randomize.actions.range"),
    "task.randomize.randomization_params.actions.range_correlated": ("task", "randomize.actions.range_correlated"),
    "task.randomize.randomization_params.actions.schedule": ("task", "randomize.actions.schedule"),
    "task.randomize.randomization_params.actions.schedule_steps": ("task", "randomize.actions.schedule_steps"),
    "task.randomize.randomization_params.sim_params.gravity.range": ("task", "randomize.gravity.range"),
    "task.randomize.clearance_curriculum_extra": ("task", "randomize.clearance_curriculum_extra"),
    "task.randomize.clearance_curriculum_steps": ("task", "randomize.clearance_curriculum_steps"),
    # sim block
    "task.sim.disable_gravity": ("task", "sim.disable_gravity"),
    "task.sim.dt": ("task", "sim.dt"),
    "task.sim.substeps": ("task", "sim.substeps"),
    # train block
    "train.ppo.horizon_length": ("ppo", "horizon"),
    "train.ppo.mini_epochs": ("ppo", "mini_epochs"),
    "train.ppo.learning_rate": ("ppo", "learning_rate"),
    "train.ppo.gamma": ("ppo", "gamma"),
    "train.ppo.tau": ("ppo", "tau"),
    "train.ppo.e_clip": ("ppo", "e_clip"),
    "train.ppo.critic_coef": ("ppo", "critic_coef"),
    "train.ppo.entropy_coef": ("ppo", "entropy_coef"),
    "train.ppo.bounds_loss_coef": ("ppo", "bounds_loss_coef"),
    "train.ppo.grad_norm": ("ppo", "grad_norm"),
    "train.ppo.kl_threshold": ("ppo", "kl_threshold"),
    "train.ppo.lr_schedule": ("ppo", "lr_schedule"),
    "train.ppo.anneal_ladder": ("ppo", "anneal_ladder"),
    "train.ppo.anneal_decay": ("ppo", "anneal_decay"),
    "train.ppo.anneal_patience": ("ppo", "anneal_patience"),
    "train.ppo.anneal_min_lr": ("ppo", "anneal_min_lr"),
    "train.ppo.anneal_margin": ("ppo", "anneal_margin"),
    "train.ppo.anchor_coef": ("ppo", "anchor_coef"),
    "train.ppo.value_bootstrap": ("ppo", "value_bootstrap"),
    "train.ppo.bootstrap_mask_success": ("ppo", "bootstrap_mask_success"),
    "train.ppo.critic_warmup_steps": ("ppo", "critic_warmup_steps"),
    "train.ppo.normalize_input": ("ppo", "normalize_input"),
    "train.ppo.normalize_value": ("ppo", "normalize_value"),
    "train.ppo.normalize_advantage": ("ppo", "normalize_advantage"),
    "train.ppo.clip_value": ("ppo", "clip_value"),
    "train.ppo.max_agent_steps": ("ppo", "max_agent_steps"),
    "train.ppo.tactile_info": ("dagger", "use_tactile"),
    "train.ppo.img_info": ("dagger", "use_img"),
    "train.ppo.seg_info": ("dagger", "use_seg"),
    "train.ppo.pcl_info": ("dagger", "use_pcl"),
    "train.ppo.obs_info": ("dagger", "use_obs"),
    "train.ppo.only_bc": ("dagger", "only_bc"),
    # the reference recipe passes only_bc through the offline_train tree
    # (reference scripts/train_s2.sh: offline_train.only_bc=True)
    "offline_train.only_bc": ("dagger", "only_bc"),
    "offline_train.from_offline": (None, None),  # accepted for recipe compat
    "train.ppo.use_priv": ("dagger", "use_priv"),
    "train.ppo.latent_loss_coef": ("dagger", "latent_loss_coef"),
    "train.ppo.action_z_weight": ("dagger", "action_z_weight"),
}


def _parse_value(v: str) -> Any:
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() in ("null", "none"):
        return None
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.startswith("[") and v.endswith("]"):
        return tuple(_parse_value(x.strip()) for x in v[1:-1].split(",") if x.strip())
    return v


def _set_path(obj, path: str, value):
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    sub = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _set_path(sub, ".".join(parts[1:]), value)})


def parse_args(argv: list[str] | None = None) -> dict:
    """Returns {task, ppo, dagger, algo, num_envs, test, checkpoint, seed, output}."""
    argv = sys.argv[1:] if argv is None else argv
    out = dict(
        task=default_task_config(),
        ppo=PPOConfig(),
        dagger=DAggerConfig(),
        algo="PPO",
        num_envs=128,
        test=False,
        checkpoint="",
        seed=42,
        output="outputs/run",
        max_epochs=None,
        collect_rotate=False,
        phase3=False,
        student_checkpoint="",
        grasp_dataset="",
        gan_checkpoint="",
        eval_envs=None,
        eval_freq_steps=10.0e6,
        noise_study=False,
    )
    truncate_grads = None
    for arg in argv:
        if "=" not in arg:
            continue
        k, v = arg.split("=", 1)
        val = _parse_value(v)
        if k in ("train.algo", "algo"):
            out["algo"] = val
        elif k in ("test",):
            out["test"] = bool(val)
        elif k in ("checkpoint", "train.load_path"):
            out["checkpoint"] = val
        elif k in ("seed",):
            out["seed"] = int(val)
        elif k in ("output", "train.ppo.output_name"):
            out["output"] = str(val)
        elif k in ("max_epochs",):
            out["max_epochs"] = int(val)
        elif k in ("task.collect_rotate", "collect_rotate"):
            out["collect_rotate"] = bool(val)
        elif k in ("phase3", "train.phase3"):
            out["phase3"] = bool(val)
        elif k in ("student_checkpoint",):
            out["student_checkpoint"] = str(val)
        elif k in ("grasp_dataset", "task.grasp_dataset"):
            out["grasp_dataset"] = str(val)
        elif k in ("gan_checkpoint", "task.tactile.model_G"):
            # tactile sim2real generator (reference tactile.sim2real +
            # tactile.model_G keys, factory_task_insertion.py:100-124)
            out["gan_checkpoint"] = str(val)
        elif k in ("eval_envs",):
            out["eval_envs"] = int(val)
        elif k in ("eval_freq_steps",):
            out["eval_freq_steps"] = float(val)
        elif k in ("noise_study",):
            out["noise_study"] = bool(val)
        elif k == "train.ppo.truncate_grads":
            # reference yaml boolean (frozen_ppo truncate_grads): True keeps
            # the configured grad_norm clip, False disables clipping. Never
            # write the boolean into the float grad_norm (False would become
            # clip-at-0 and silently zero every gradient). Recorded here and
            # applied once AFTER all overrides (round-3 ADVICE: applying it
            # inline was order-dependent vs a later train.ppo.grad_norm=X).
            if not isinstance(val, bool):
                raise SystemExit("train.ppo.truncate_grads expects true/false")
            truncate_grads = val
        elif k == "task":
            pass  # single task family; accepted for recipe compatibility
        elif k in _KEYMAP:
            name, path = _KEYMAP[k]
            if name is None:
                pass  # accepted for reference recipe compatibility, no-op
            elif path is None:
                out[name] = val
            else:
                out[name] = _set_path(out[name], path, val)
        elif k.startswith("task."):
            out["task"] = _set_path(out["task"], k[len("task."):], val)
        elif k.startswith("ppo."):
            out["ppo"] = _set_path(out["ppo"], k[len("ppo."):], val)
        elif k.startswith("dagger."):
            out["dagger"] = _set_path(out["dagger"], k[len("dagger."):], val)
        else:
            raise SystemExit(f"unknown override: {k}")
    if truncate_grads is False:
        out["ppo"] = _set_path(out["ppo"], "grad_norm", float("inf"))
    return out


def main(argv: list[str] | None = None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .algo.trainer import DAggerTrainer, PPOTrainer
    from .assets import build_subassembly_set
    from .physics.robot import build_kuka_openhand

    args = parse_args(argv)
    model = build_kuka_openhand()
    subs = build_subassembly_set()

    if args["collect_rotate"]:
        # plug-rotation tactile collection mode (scripts/collect_rotate.sh)
        from .algo.collect import collect_rotating_plug

        n = collect_rotating_plug(args["task"], model, subs,
                                  n_envs=args["num_envs"],
                                  out_path=f"{args['output']}_rotate.npz")
        print(f"collected {n} rotating-plug tactile frames")
        return

    grasp_data = None
    if args["grasp_dataset"] and not args["task"].grasp_at_init:
        # dataset-driven resets (reference _reset_predefined_environment path);
        # grasp_at_init=True constructs the grasp at reset instead (the
        # analytic-closure analog of the reference's move-close-grasp loops,
        # factory_task_insertion.py:1418-1430) and ignores the dataset
        from .envs.grasp_gen import load_grasp_data

        grasp_data = load_grasp_data(args["grasp_dataset"], n_sub=len(subs.names),
                                     model=model)

    if args["algo"] == "PPO":
        trainer = PPOTrainer(args["task"], args["ppo"], model, subs,
                             args["num_envs"], args["output"], seed=args["seed"],
                             grasp_data=grasp_data, eval_envs=args["eval_envs"],
                             eval_freq_steps=args["eval_freq_steps"])
        if args["checkpoint"]:
            trainer.restore(args["checkpoint"])
        if args["test"]:
            trainer.test()
        else:
            trainer.train(max_epochs=args["max_epochs"])
    elif args["algo"] == "ExtrinsicAdapt":
        if not args["checkpoint"]:
            raise SystemExit("ExtrinsicAdapt requires checkpoint=<teacher ckpt dir>")
        trainer = DAggerTrainer(args["task"], args["dagger"], model, subs,
                                args["num_envs"], args["output"],
                                teacher_ckpt_path=args["checkpoint"], seed=args["seed"],
                                phase3=args["phase3"],
                                student_ckpt_path=args["student_checkpoint"],
                                gan_ckpt_path=args["gan_checkpoint"],
                                eval_envs=args["eval_envs"],
                                eval_freq_steps=args["eval_freq_steps"])
        if args["test"]:
            trainer.test(eval_envs=args["eval_envs"])
            if args["noise_study"]:
                # reference test_log noise sweep (ext_adapt.py:437-561)
                trainer.test_log(eval_envs=args["eval_envs"])
        else:
            trainer.train(max_epochs=args["max_epochs"] or 1000)
    else:
        raise SystemExit(f"unknown algo {args['algo']}")


if __name__ == "__main__":
    main()
