"""Benchmark: fused PPO train-epoch throughput at the north-star config.

Primary metric (BASELINE.json north star): env-steps/sec/chip of the FULL
fused PPO train epoch — physics + DR + resets + sensors (tactile 3×64×64 and
96×54 depth+seg cameras ON) + rollout + GAE + minibatch updates in one jit
graph — at 8192 envs. `vs_baseline` divides by the driver's 10k A100
IsaacGym reference point (target ≥ 5.0).

Extra keys on the same JSON line: the state-only rate at 1024 envs (the
round-1 metric, for continuity) and an MFU estimate from XLA's cost
analysis (flops/sec over the v5e bf16 peak — the physics path runs f32
under ops.f32_matmul, so this is a conservative utilization bound).
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ASSUMED_A100_BASELINE = 10_000.0  # env-steps/sec, IsaacGym factory insertion
V5E_BF16_PEAK_FLOPS = 197e12      # per chip


def build_epoch(cfg, n_envs, horizon=64):
    from isaacgyminsertion_tpu.algo import ppo as ppo_mod
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    ppo_cfg = ppo_mod.PPOConfig(horizon=horizon)
    net, tx, state, train_epoch = ppo_mod.build(
        cfg, ppo_cfg, model, subs, n_envs, jax.random.PRNGKey(0)
    )
    return jax.jit(train_epoch), state, ppo_cfg


def measure(step, state, n_envs, horizon, epochs=3):
    lowered = step.lower(state)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    state, metrics = step(state)   # warmup (already compiled)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(epochs):
        state, metrics = step(state)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / epochs
    rate = horizon * n_envs / dt
    mfu = flops / dt / V5E_BF16_PEAK_FLOPS if flops else 0.0
    return rate, mfu


def main(n_ns=8192, n_so=1024, horizon=64):
    import dataclasses
    import sys

    from isaacgyminsertion_tpu.envs.config import default_task_config

    base = default_task_config()

    # north star: 8192 envs, tactile + depth(+seg) cameras on. If the chip
    # can't take the full batch (HBM, or a transient backend fault), degrade
    # to the largest sensors-on batch that runs rather than reporting nothing.
    # render_capacity=0.75: render-on-demand gathers only the env rows that
    # consume a fresh frame this step (expected consume fraction 0.675 with
    # max_skip=2 + delay 0.1); what the policy observes is unchanged up to the
    # vanishing binomial tail, so this is the honest sensors-on number.
    cfg_ns = base.replace(env=dataclasses.replace(
        base.env, tactile=True, external_cam=True, depth_cam=True,
        seg_cam=True, render_capacity=0.75))
    rate_ns = mfu_ns = 0.0
    for n_try in (n_ns, n_ns // 2, n_ns // 4):
        try:
            step, state, ppo_cfg = build_epoch(cfg_ns, n_try, horizon)
            rate_ns, mfu_ns = measure(step, state, n_try, ppo_cfg.horizon)
            n_ns = n_try
            break
        except Exception as e:  # OOM / backend fault: try the next size down
            print(f"bench: sensors-on @{n_try} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            if n_try == n_ns // 4:
                raise

    # round-1 continuity metric: state-only at 1024 envs
    step1, state1, ppo_cfg = build_epoch(base, n_so, horizon)
    rate_so, _ = measure(step1, state1, n_so, ppo_cfg.horizon)

    print(json.dumps({
        "metric": f"ppo_env_steps_per_sec_sensors_on_{n_ns}",
        "value": round(rate_ns, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate_ns / ASSUMED_A100_BASELINE, 3),
        f"state_only_{n_so}": round(rate_so, 1),
        "mfu_estimate": round(mfu_ns, 4),
        "config": f"{n_ns} envs, tactile 3x64x64 + depth/seg 96x54, "
                  f"render_capacity 0.75, horizon {horizon}",
    }))


if __name__ == "__main__":
    import sys

    main(*[int(a) for a in sys.argv[1:4]])
