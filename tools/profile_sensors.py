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


def main(n_envs=8192, reps=10, rounds=6):
    """Interleaved timing (round-5 fix for the VERDICT r4 anomaly: at 256
    envs "+cam" measured FASTER than state-only). The old loop timed each
    variant once, minutes apart — on the shared axon chip, pool contention
    and tunnel latency drift between rows swamp a few-ms step, making rows
    incomparable. Now every variant is compiled first, then all variants are
    timed in alternating rounds; the per-variant MEDIAN of round means
    cancels drift, and min is printed as the contention-free floor."""
    import numpy as np

    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs import insertion as ins
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    base = default_task_config()

    variants = [
        ("state", {}),
        ("+tactile", dict(tactile=True)),
        ("+cam", dict(external_cam=True, depth_cam=True, seg_cam=True)),
        ("full", dict(tactile=True, external_cam=True, depth_cam=True,
                      seg_cam=True)),
    ]
    a = jnp.zeros((n_envs, 6))
    runs = {}
    for name, env_kw in variants:
        cfg = base.replace(env=dataclasses.replace(base.env, **env_kw))
        state = ins.reset_all(cfg, model, subs, jax.random.PRNGKey(0), n_envs)
        step = jax.jit(lambda s, aa, _cfg=cfg: ins.step(_cfg, model, subs, s, aa))
        state, out = step(state, a)  # compile + warm
        jax.block_until_ready(out.rew)
        runs[name] = dict(step=step, state=state, times=[])
        print(f"compiled {name}", flush=True)

    for r in range(rounds):
        for name, _ in variants:
            v = runs[name]
            s = v["state"]
            t0 = time.perf_counter()
            for _ in range(reps):
                s, out = v["step"](s, a)
            jax.block_until_ready(out.rew)
            v["times"].append((time.perf_counter() - t0) / reps)
            v["state"] = s

    res = {}
    for name, _ in variants:
        ts = np.asarray(runs[name]["times"])
        med, mn = float(np.median(ts)), float(ts.min())
        res[name] = med
        print(f"{name:10s}: median {med*1e3:8.2f} ms/step  min {mn*1e3:8.2f}"
              f"  ({n_envs/med:,.0f} env-steps/s; spread "
              f"{(ts.max()-ts.min())/med*100:.0f}%)")
    print(f"tactile delta: {(res['+tactile'] - res['state']) * 1e3:.2f} ms, "
          f"cam delta: {(res['+cam'] - res['state']) * 1e3:.2f} ms, "
          f"full - state: {(res['full'] - res['state']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
