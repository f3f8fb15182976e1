"""TPU probe: teacher-driven rollout, scan state/outputs for first NaN."""
import os, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import dataclasses

from isaacgyminsertion_tpu.algo import ext_adapt as ea
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion as ins
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit
from isaacgyminsertion_tpu.models.running_mean_std import rms_normalize
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.utils.checkpoint import restore_path

print("backend:", jax.default_backend(), jax.devices())
N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 120

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()
cfg0 = default_task_config()
cfg = cfg0.replace(env=dataclasses.replace(
    cfg0.env, tactile=True, external_cam=True, depth_cam=True,
    seg_cam=True, pcl_cam=True, render_capacity=0.75,
))
tree = restore_path("checkpoints/teacher_r2b/best_success.ckpt")
obs_dim = cfg.env.num_obs_hist * cfg.env.num_observations
net = ActorCriticSplit(num_actions=cfg.env.num_actions, obs_dim=obs_dim,
                       priv_dim=cfg.env.num_states)

def teacher_act(state):
    o = rms_normalize(tree["obs_rms"], state.obs_queue)
    p = rms_normalize(tree["priv_rms"], ins.priv_info_of(cfg, MODEL, state))
    mu, _, _, latent, _ = net.apply(tree["params"], o, p)
    return jnp.clip(mu, -1.0, 1.0), latent

@jax.jit
def roll10(state):
    def body(s, _):
        a, latent = teacher_act(s)
        s, out = ins.step(cfg, MODEL, SUBS, s, a)
        return s, (a, latent, out.rew)
    return jax.lax.scan(body, state, None, length=10)

def scan_tree(t, path=""):
    bad = []
    if hasattr(t, "_fields"):
        for k, v in zip(t._fields, t): bad += scan_tree(v, path + "/" + k)
    elif isinstance(t, dict):
        for k, v in t.items(): bad += scan_tree(v, path + "/" + str(k))
    elif isinstance(t, (list, tuple)):
        for i, v in enumerate(t): bad += scan_tree(v, path + f"/{i}")
    elif t is not None and hasattr(t, "dtype"):
        a = np.asarray(t)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            nb = int(np.size(a) - np.isfinite(a).sum())
            bad.append(f"{path} shape={a.shape} nonfinite={nb}")
    return bad

state = ins.reset_all(cfg, MODEL, SUBS, jax.random.PRNGKey(0), N)
for step_i in range(0, STEPS, 10):
    state, (a, latent, rew) = roll10(state)
    bad = scan_tree(state, "state")
    bad += scan_tree({"act": a, "latent": latent, "rew": rew}, "out")
    print(f"step {step_i+10}: rew={float(np.asarray(rew)[-1].mean()):.4f} "
          f"bad={len(bad)}", flush=True)
    if bad:
        print("FIRST NONFINITE ARRAYS:", *bad[:30], sep="\n  ")
        break
else:
    print("clean rollout, no NaN")
