#!/usr/bin/env python
"""Student-distillation triage (a): frozen-buffer overfit test.

VERDICT r3 item 1a: freeze ONE rollout buffer (teacher-driven states,
teacher actions as targets) and train the student offline on it. If action
MSE cannot reach ~0.02 the model/loss/normalization is broken — no amount
of DAgger scheduling will save it. If it can, the round-3 plateau at
~0.15 was a state-distribution / schedule problem, not a capacity problem.

No reference counterpart (diagnostic only); the training config mirrors
scripts/train_s2.sh (obs+pcl BC student) unless overridden.

Usage:
  python tools/triage_overfit.py [--envs 256] [--horizon 64] [--steps 2000]
                                 [--modalities obs,pcl] [--latent]
                                 [--ckpt checkpoints/teacher_r2b/best_success.ckpt]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

from isaacgyminsertion_tpu.algo import ext_adapt as ea
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit
from isaacgyminsertion_tpu.models.running_mean_std import rms_normalize, rms_update
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.utils.checkpoint import restore_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--mb", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--modalities", default="obs,pcl")
    ap.add_argument("--latent", action="store_true",
                    help="latent-injection student (round-3 config) instead of only-BC")
    ap.add_argument("--ckpt", default="checkpoints/teacher_r2b/best_success.ckpt")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    mods = set(args.modalities.split(","))
    cfg0 = default_task_config()
    cfg = cfg0.replace(env=dataclasses.replace(
        cfg0.env,
        tactile="tactile" in mods,
        external_cam=bool({"img", "seg", "pcl"} & mods),
        depth_cam="img" in mods,
        seg_cam=bool({"seg", "pcl"} & mods),
        pcl_cam="pcl" in mods,
        render_capacity=0.75 if "tactile" in mods else 1.0,
    ), reset_at_success=True, reset_at_fails=True, rand_inits=True)

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    tree = restore_path(args.ckpt)
    teacher = ea.TeacherBundle(tree["params"], tree["obs_rms"], tree["priv_rms"])
    da = ea.DAggerConfig(
        horizon=args.horizon, only_bc=not args.latent,
        use_obs="obs" in mods, use_tactile="tactile" in mods,
        use_img="img" in mods, use_seg="seg" in mods, use_pcl="pcl" in mods,
        use_priv="priv" in mods, learning_rate=args.lr,
    )
    student, tx, ds, _ = ea.build(cfg, da, model, subs, args.envs, teacher,
                                  jax.random.PRNGKey(0))
    obs_dim = cfg.env.num_obs_hist * cfg.env.num_observations
    teacher_net = ActorCriticSplit(num_actions=cfg.env.num_actions,
                                   obs_dim=obs_dim, priv_dim=cfg.env.num_states)

    # ---- collect ONE teacher-driven rollout buffer
    def teacher_act(obs, priv):
        o = rms_normalize(teacher.obs_rms, obs)
        p = rms_normalize(teacher.priv_rms, priv)
        mu, _, _, latent_gt, _ = teacher_net.apply(teacher.params, o, p)
        return jnp.clip(mu, -1.0, 1.0), latent_gt

    def collect_step(carry, _):
        env_state = carry
        obs = env_state.obs_queue
        stud_obs = env_state.obs_stud_queue
        priv = insertion.priv_info_of(cfg, model, env_state)
        t_actions, latent_gt = teacher_act(obs, priv)
        prev = ea._prev_out_of(env_state, cfg)
        env_state, out = insertion.step(cfg, model, subs, env_state, t_actions)
        sample = dict(obs=obs, student_obs=stud_obs, t_actions=t_actions,
                      latent_gt=latent_gt, tactile=prev.tactile, img=prev.img,
                      seg=prev.seg, pcl=prev.pcl, priv=priv)
        return env_state, sample

    @jax.jit
    def collect(env_state):
        return jax.lax.scan(collect_step, env_state, None, length=args.horizon)

    env_state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(1), args.envs)
    t0 = time.time()
    env_state, traj = collect(env_state)
    traj = jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), traj)
    B = int(traj["obs"].shape[0])
    print(f"collected buffer: {B} samples in {time.time()-t0:.1f}s", flush=True)

    # freeze normalizers on this buffer (offline overfit: no running update)
    ds = ds._replace(
        stud_obs_rms=rms_update(ds.stud_obs_rms, traj["student_obs"]),
        pcl_rms=(rms_update(ds.pcl_rms, traj["pcl"].reshape(-1, 3))
                 if da.use_pcl and traj["pcl"].size else ds.pcl_rms),
    )
    student_act = ea.make_student_act(cfg, da, teacher_net, teacher, student)

    def loss_fn(params, mb):
        out_like = insertion.StepOutput(
            obs=mb["obs"], student_obs=mb["student_obs"], priv_info=mb["priv"],
            rew=None, reset=None, timeout=None, extras={},
            tactile=mb["tactile"], img=mb["img"], seg=mb["seg"], pcl=mb["pcl"],
            contacts=None)
        s_actions, s_latent = student_act(params, ds, mb["student_obs"], out_like)
        w = jnp.ones((cfg.env.num_actions,)).at[2].set(da.action_z_weight)
        action_loss = jnp.mean(w * jnp.square(s_actions - mb["t_actions"]))
        raw_mse = jnp.mean(jnp.square(s_actions - mb["t_actions"]))
        loss = action_loss
        if args.latent and da.latent_loss_coef > 0:
            loss = loss + da.latent_loss_coef * jnp.mean(
                jnp.square(s_latent - mb["latent_gt"]))
        return loss, raw_mse

    @jax.jit
    def train_step(params, opt_state, key):
        idx = jax.random.randint(key, (args.mb,), 0, B)
        mb = {k: v[idx] for k, v in traj.items()}
        (loss, raw), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, raw

    params, opt_state = ds.student_params, ds.opt_state
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    hist = []
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss, raw = train_step(params, opt_state, k)
        if i % 100 == 0 or i == args.steps - 1:
            row = {"step": i, "weighted_mse": float(loss), "raw_mse": float(raw),
                   "elapsed_s": round(time.time() - t0, 1)}
            hist.append(row)
            print(json.dumps(row), flush=True)

    final = hist[-1]
    verdict = ("PASS: model/loss/normalization can fit teacher actions"
               if final["raw_mse"] <= 0.02 else
               "FAIL: cannot overfit a frozen buffer -> model/loss/norm broken")
    print(json.dumps({"verdict": verdict, "modalities": sorted(mods),
                      "only_bc": not args.latent, **final}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for row in hist:
                f.write(json.dumps(row) + "\n")
            f.write(json.dumps({"verdict": verdict}) + "\n")


if __name__ == "__main__":
    main()
