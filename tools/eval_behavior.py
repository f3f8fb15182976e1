#!/usr/bin/env python
"""Behavior probe: run a checkpointed teacher deterministically and print
plug-to-socket distance statistics + success over an episode.

Usage: python tools/eval_behavior.py <ckpt_path> [n_envs] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit
from isaacgyminsertion_tpu.models.running_mean_std import rms_normalize
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.utils.checkpoint import restore_path


def main(ckpt: str, n_envs: int = 64, seed: int = 123):
    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    tree = restore_path(ckpt)
    net = ActorCriticSplit(num_actions=6, obs_dim=15, priv_dim=64)
    state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(seed), n_envs)
    step = jax.jit(lambda s, a: insertion.step(cfg, model, subs, s, a))

    @jax.jit
    def act(s):
        o = rms_normalize(tree["obs_rms"], s.obs_queue)
        p = rms_normalize(tree["priv_rms"], insertion.priv_info_of(cfg, model, s))
        mu, _, _, _, _ = net.apply(tree["params"], o, p)
        return jnp.clip(mu, -1.0, 1.0)

    ever = jnp.zeros((n_envs,))
    for t in range(cfg.rl.max_episode_length):
        state, out = step(state, act(state))
        ever = jnp.maximum(ever, out.extras["successes"])
        if t % 100 == 99:
            d = jnp.linalg.norm(state.phys.plug_pos[:, :2] - state.params.socket_pos[:, :2], axis=-1)
            dz = state.phys.plug_pos[:, 2] - state.params.socket_pos[:, 2]
            print(f"t={t}: xy med {float(jnp.median(d))*1000:6.1f}mm  p25 "
                  f"{float(jnp.percentile(d, 25))*1000:6.1f}mm  z med "
                  f"{float(jnp.median(dz))*1000:6.1f}mm  degrasp "
                  f"{float(state.degrasp_buf.mean()):.2f}  success {float(ever.mean()):.3f}")
    print(f"episode success rate: {float(ever.mean()):.4f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 64,
         int(sys.argv[3]) if len(sys.argv) > 3 else 123)
