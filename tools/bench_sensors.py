"""Measure the per-step cost of the sensors-on env step at scale.

Profiles the jitted full env step (state-only vs tactile+depth+seg[+pcl])
at the north-star 8192-env configuration (BASELINE.json: ≥5× 10k A100
env-steps/s with tactile+depth on)."""

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


def bench_step(cfg, n_envs, label, iters=20):
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs import insertion as ins
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    state = ins.reset_all(cfg, model, subs, jax.random.PRNGKey(0), n_envs)
    step = jax.jit(lambda s, a: ins.step(cfg, model, subs, s, a))
    act = jnp.zeros((n_envs, 6))
    state, out = step(state, act)   # compile
    jax.block_until_ready(out.rew)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, act)
    jax.block_until_ready(out.rew)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms/step  → {n_envs/dt:,.0f} env-steps/s")
    return dt


def main(n_envs=8192):
    from isaacgyminsertion_tpu.envs.config import default_task_config

    base = default_task_config()
    print(f"n_envs = {n_envs}, backend = {jax.default_backend()}")
    bench_step(base, n_envs, "state-only")
    e = base.env
    cfg_t = base.replace(env=dataclasses.replace(e, tactile=True))
    bench_step(cfg_t, n_envs, "tactile")
    cfg_d = base.replace(env=dataclasses.replace(
        e, external_cam=True, depth_cam=True, seg_cam=True))
    bench_step(cfg_d, n_envs, "depth+seg")
    cfg_td = base.replace(env=dataclasses.replace(
        e, tactile=True, external_cam=True, depth_cam=True, seg_cam=True))
    bench_step(cfg_td, n_envs, "tactile+depth+seg (north star)")
    cfg_all = base.replace(env=dataclasses.replace(
        e, tactile=True, external_cam=True, depth_cam=True, seg_cam=True,
        pcl_cam=True))
    bench_step(cfg_all, n_envs, "all sensors (+pcl)")


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
