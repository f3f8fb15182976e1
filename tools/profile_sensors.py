"""Sensors-on step attribution at the north-star config (8192 envs).

Compiles env-step VARIANTS with sensor modalities toggled and diffs wall
times (same knock-out methodology as profile_ablate.py — per-modality jits
would re-introduce dispatch boundaries that the fused step doesn't have):

  state      tactile/cam off (the physics+obs floor)
  +tactile   tactile only
  +cam       depth+seg only
  full       tactile + depth + seg (bench.py north-star env config)

Usage: python tools/profile_sensors.py [n_envs] [reps]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main(n_envs=8192, reps=10):
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs import insertion as ins
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    base = default_task_config()

    def variant(name, **env_kw):
        cfg = base.replace(env=dataclasses.replace(base.env, **env_kw))
        state = ins.reset_all(cfg, model, subs, jax.random.PRNGKey(0), n_envs)
        step = jax.jit(lambda s, a: ins.step(cfg, model, subs, s, a))
        a = jnp.zeros((n_envs, 6))
        state, out = step(state, a)  # compile + warm
        jax.block_until_ready(out.rew)
        t0 = time.perf_counter()
        s = state
        for _ in range(reps):
            s, out = step(s, a)
        jax.block_until_ready(out.rew)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:10s}: {dt * 1e3:8.2f} ms/step   ({n_envs / dt:,.0f} env-steps/s)")
        return dt

    t_state = variant("state")
    t_tact = variant("+tactile", tactile=True)
    t_cam = variant("+cam", external_cam=True, depth_cam=True, seg_cam=True)
    t_full = variant("full", tactile=True, external_cam=True, depth_cam=True,
                     seg_cam=True)
    print(f"tactile delta: {(t_tact - t_state) * 1e3:.2f} ms, "
          f"cam delta: {(t_cam - t_state) * 1e3:.2f} ms, "
          f"full - state: {(t_full - t_state) * 1e3:.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
