"""Benchmark: fused PPO train-epoch throughput (env-steps/sec/chip).

Runs the flagship teacher-PPO configuration (state-only obs, full physics +
DR + reset pipeline) with rollout horizon 64 and the whole
sim→obs→policy→GAE→update loop in one jit graph, and reports environment
steps per second on the current device.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is measured
against the driver's north-star reference point of 10k env-steps/sec for
IsaacGym PhysX factory-insertion on A100 (BASELINE.json north_star: ≥5× ⇒
vs_baseline ≥ 5.0 is the target at 8192 envs with sensors on).
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ASSUMED_A100_BASELINE = 10_000.0  # env-steps/sec, IsaacGym factory insertion


def main(n_envs: int = 1024, epochs: int = 3):
    from isaacgyminsertion_tpu.algo import ppo as ppo_mod
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    ppo_cfg = ppo_mod.PPOConfig()

    net, tx, state, train_epoch = ppo_mod.build(
        cfg, ppo_cfg, model, subs, n_envs, jax.random.PRNGKey(0)
    )
    step = jax.jit(train_epoch)

    # warmup / compile
    state, metrics = step(state)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(epochs):
        state, metrics = step(state)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    env_steps = epochs * ppo_cfg.horizon * n_envs
    rate = env_steps / dt
    print(json.dumps({
        "metric": "ppo_env_steps_per_sec",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / ASSUMED_A100_BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
