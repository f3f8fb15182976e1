#!/usr/bin/env python
"""Student behavior probe: drive the env with the distilled student
(deterministic, β=0) and print per-phase plug→socket distance statistics —
distinguishes "perception broken / flailing" (XY error never shrinks) from
"aligned but cannot finish" (XY ~ tolerance, insufficient depth).

Usage: python tools/eval_student_behavior.py <teacher_ckpt> <student_ckpt>
           [n_envs] [seed] [only_bc=1]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.algo import ext_adapt as ea
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.utils.checkpoint import restore_path


def main(teacher_ckpt, student_ckpt, n_envs=64, seed=123, only_bc=True):
    cfg = default_task_config()
    cfg = cfg.replace(
        reset_at_fails=False, reset_at_success=False,
        env=dataclasses.replace(cfg.env, external_cam=True, seg_cam=True,
                                pcl_cam=True, depth_cam=True),
        randomize=dataclasses.replace(cfg.randomize,
                                      clearance_curriculum_extra=0.0),
    )
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    ttree = restore_path(teacher_ckpt)
    teacher = ea.TeacherBundle(params=ttree["params"], obs_rms=ttree["obs_rms"],
                               priv_rms=ttree["priv_rms"])
    da_cfg = ea.DAggerConfig(use_obs=True, use_pcl=True, only_bc=only_bc)
    obs_dim = cfg.env.num_obs_hist * cfg.env.num_observations
    teacher_net = ActorCriticSplit(num_actions=cfg.env.num_actions,
                                   obs_dim=obs_dim, priv_dim=cfg.env.num_states)
    from isaacgyminsertion_tpu.models.student import MultiModalModel

    student = MultiModalModel(
        use_obs=True, use_tactile=False, use_img=False, use_seg=False,
        use_pcl=True, latent_dim=6 if only_bc else 8, bc_mode=only_bc,
        num_points=cfg.env.num_points,
        num_points_socket=cfg.env.num_points_socket,
        num_points_goal=cfg.env.num_points_goal if cfg.env.merge_goal_pcl else 0,
    )
    stree = restore_path(student_ckpt)
    student_act = ea.make_student_act(cfg, da_cfg, teacher_net, teacher, student)

    env_state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(seed), n_envs)

    @jax.jit
    def probe_step(env_state):
        da_like = ea.DAggerState(
            student_params=None, opt_state=None,
            stud_obs_rms=stree["stud_obs_rms"], pcl_rms=stree["pcl_rms"],
            env_state=None, rng=None, epoch=None, agent_steps=None)
        prev_out = ea._prev_out_of(env_state, cfg)
        acts, _ = student_act(stree["student_params"], da_like,
                              env_state.obs_stud_queue, prev_out)
        env_state, out = insertion.step(cfg, model, subs, env_state, acts)
        dxy = jnp.linalg.norm(
            env_state.phys.plug_pos[:, :2] - env_state.params.socket_pos[:, :2],
            axis=-1)
        dz = env_state.phys.plug_pos[:, 2] - (
            env_state.params.socket_pos[:, 2] + env_state.params.socket_height)
        return env_state, dxy, dz, out.extras["successes"], env_state.degrasp_buf

    T = cfg.rl.max_episode_length
    stats = []
    ever = np.zeros(n_envs)
    for t in range(T):
        env_state, dxy, dz, succ, degrasp = probe_step(env_state)
        ever = np.maximum(ever, np.asarray(succ))
        if t % 50 == 0 or t == T - 1:
            stats.append((t, np.median(np.asarray(dxy)) * 1000,
                          np.median(np.asarray(dz)) * 1000,
                          float(np.mean(np.asarray(degrasp)))))
    print("  t | med XY err (mm) | med z above tip (mm) | degrasp frac")
    for t, xy, z, dg in stats:
        print(f"{t:4d} | {xy:15.1f} | {z:20.1f} | {dg:.3f}")
    print(f"ever-success: {ever.mean():.4f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0], a[1], int(a[2]) if len(a) > 2 else 64,
         int(a[3]) if len(a) > 3 else 123,
         (a[4] != "0") if len(a) > 4 else True)
