#!/usr/bin/env python
"""Roofline attribution for the fused PPO epoch: is it compute- or
HBM-bandwidth-bound?

Round-3 verdict: PARITY.md asserts the sensors-on pipeline is
"bandwidth-bound, MFU is irrelevant" without a number. This tool derives
both utilizations from XLA's own cost model (`compiled.cost_analysis()`:
flops + bytes accessed) and the measured wall time:

  MFU  = flops / (wall * peak_flops)
  MBU  = bytes accessed / (wall * peak_hbm_bw)

Peak numbers default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM); override
with IGT_PEAK_TFLOPS / IGT_PEAK_GBPS for other chips. XLA's bytes-accessed
model counts each buffer touch (not unique HBM traffic), so MBU is an
upper-ish estimate — useful for ranking and for the bound/not-bound call,
not as an exact DRAM counter.

Usage: python tools/roofline.py [n_envs] [mode: state|sensors|pcl] [reps]
"""

from __future__ import annotations

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


def main(n_envs=8192, mode="sensors", reps=5):
    from isaacgyminsertion_tpu.algo import ppo as ppo_mod
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    base = default_task_config()
    if mode == "sensors":
        cfg = base.replace(env=dataclasses.replace(
            base.env, tactile=True, external_cam=True, depth_cam=True,
            seg_cam=True, render_capacity=0.75))
    elif mode == "pcl":
        cfg = base.replace(env=dataclasses.replace(
            base.env, tactile=True, external_cam=True, depth_cam=True,
            seg_cam=True, pcl_cam=True, render_capacity=0.75))
    elif mode == "obs_pcl":
        cfg = base.replace(env=dataclasses.replace(
            base.env, external_cam=True, seg_cam=True, pcl_cam=True))
    else:
        cfg = base

    ppo_cfg = ppo_mod.PPOConfig(horizon=64, mini_epochs=8)
    net, tx, state, train_epoch = ppo_mod.build(
        cfg, ppo_cfg, model, subs, n_envs, jax.random.PRNGKey(0))
    # progress markers (round-4 postmortem: the tool died compile-bound under
    # a 900 s cap leaving a 147-byte log and no way to tell how far it got)
    print(f"roofline: backend={jax.default_backend()} mode={mode} "
          f"n_envs={n_envs}; lowering...", flush=True)
    t_c = time.perf_counter()
    lowered = jax.jit(train_epoch).lower(state)
    print("roofline: compiling (first compile ~15-20 min cold through the "
          "axon tunnel; persistent cache makes reruns instant)...", flush=True)
    compiled = lowered.compile()
    print(f"roofline: compiled in {time.perf_counter()-t_c:.1f}s; "
          f"measuring {reps} epochs...", flush=True)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # measure
    state, _ = compiled(state)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = compiled(state)
    jax.block_until_ready(state.params)
    wall = (time.perf_counter() - t0) / reps

    peak_tflops = float(os.environ.get("IGT_PEAK_TFLOPS", 197.0))  # v5e bf16
    peak_gbps = float(os.environ.get("IGT_PEAK_GBPS", 819.0))      # v5e HBM
    steps = ppo_cfg.horizon * n_envs
    out = {
        "mode": mode,
        "n_envs": n_envs,
        "env_steps_per_sec": round(steps / wall, 1),
        "wall_s_per_epoch": round(wall, 4),
        "xla_flops_per_epoch": flops,
        "xla_bytes_accessed_per_epoch": bytes_acc,
        "mfu": round(flops / (wall * peak_tflops * 1e12), 5),
        "mbu": round(bytes_acc / (wall * peak_gbps * 1e9), 5),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_acc, 1.0), 3),
        "device_kind": jax.devices()[0].device_kind,
        "note": "mbu from XLA bytes-accessed (per-buffer-touch, not unique "
                "DRAM traffic); bound call: mbu >> mfu -> bandwidth-bound",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 8192, a[1] if len(a) > 1 else "sensors",
         int(a[2]) if len(a) > 2 else 5)
