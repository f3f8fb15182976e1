"""Hot-path ablation profiler: times env-step variants to locate cost.

Usage: python profile_step.py [n_envs] [reps]
Variants:
  full          complete insertion.step
  physics_only  engine.step alone (no obs/reward/reset pipelines)
  sensors_on    insertion.step with tactile+depth+seg+pcl+contact GT
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:14s} {dt*1e3:8.2f} ms/step", flush=True)
    return dt


def main(n_envs=1024, reps=20):
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs import insertion
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics import engine
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()

    state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(0), n_envs)
    acts = jnp.zeros((n_envs, 6))

    full = jax.jit(lambda s: insertion.step(cfg, model, subs, s, acts)[0])
    timeit("full", full, state, reps=reps)

    ctrl = engine.ControlInput(
        q_target=state.phys.q, tau_cmd=jnp.zeros_like(state.phys.q),
        torque_mode_mask=jnp.zeros((15,)), plug_wrench=jnp.zeros((n_envs, 6)),
    )
    phys_step = jax.jit(lambda p, s: engine.step(model, p, s, ctrl))
    timeit("physics_only", phys_step, state.params, state.phys, reps=reps)

    cfg_sens = cfg.replace(env=dataclasses.replace(
        cfg.env, tactile=True, external_cam=True, depth_cam=True, seg_cam=True,
        pcl_cam=True, compute_contact_gt=True))
    state_s = insertion.reset_all(cfg_sens, model, subs, jax.random.PRNGKey(0), n_envs)
    sens = jax.jit(lambda s: insertion.step(cfg_sens, model, subs, s, acts)[0])
    timeit("sensors_on", sens, state_s, reps=max(reps // 4, 3))

    # per-modality ablations (each = base step + one modality)
    for name, flags in (
        ("tactile_only", dict(tactile=True)),
        ("depthseg_only", dict(external_cam=True, depth_cam=True, seg_cam=True)),
        ("pcl_only", dict(external_cam=True, pcl_cam=True)),
        ("contact_only", dict(compute_contact_gt=True)),
    ):
        cfg_m = cfg.replace(env=dataclasses.replace(cfg.env, **flags))
        st_m = insertion.reset_all(cfg_m, model, subs, jax.random.PRNGKey(0), n_envs)
        fn = jax.jit(lambda s, c=cfg_m: insertion.step(c, model, subs, s, acts)[0])
        timeit(name, fn, st_m, reps=max(reps // 4, 3))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(n, r)
