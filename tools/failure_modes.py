#!/usr/bin/env python
"""Failure-mode breakdown for a checkpointed teacher: classifies each env's
episode (success / degrasped / engaged-but-never-inserted / never-engaged),
reports per-subassembly success rates and distance stats. Tells whether the
success ceiling is policy-limited (never reaches the hole) or physics/
clearance-limited (engages but can't insert; or degrasps on contact).

Usage: python tools/failure_modes.py <ckpt_path> [n_envs] [seed]
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


def main(ckpt: str, n_envs: int = 512, seed: int = 123):
    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    tree = restore_path(ckpt)
    net = ActorCriticSplit(num_actions=6, obs_dim=15, priv_dim=64)
    state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(seed), n_envs)
    sub_idx = np.asarray(state.sub_idx if hasattr(state, "sub_idx") else
                         jnp.argmax(state.params.kind_onehot, -1))

    @jax.jit
    def roll_chunk(state, flags):
        def body(carry, _):
            s, fl = carry
            o = rms_normalize(tree["obs_rms"], s.obs_queue)
            p = rms_normalize(tree["priv_rms"], insertion.priv_info_of(cfg, model, s))
            mu, _, _, _, _ = net.apply(tree["params"], o, p)
            s, out = insertion.step(cfg, model, subs, s, jnp.clip(mu, -1.0, 1.0))
            socket_tip = s.params.socket_pos.at[:, 2].add(s.params.socket_height)
            xy = jnp.linalg.norm(s.phys.plug_pos[:, :2] - socket_tip[:, :2], axis=-1)
            engaged = (s.phys.plug_pos[:, 2] < socket_tip[:, 2]) & (xy < cfg.rl.close_error_thresh)
            fl = dict(
                ever_success=jnp.maximum(fl["ever_success"], s.success_reset_buf.astype(jnp.float32)),
                ever_degrasp=jnp.maximum(fl["ever_degrasp"], s.degrasp_buf.astype(jnp.float32)),
                ever_engaged=jnp.maximum(fl["ever_engaged"], engaged.astype(jnp.float32)),
                min_xy=jnp.minimum(fl["min_xy"], xy),
                min_z=jnp.minimum(fl["min_z"], s.phys.plug_pos[:, 2] - s.params.socket_pos[:, 2]),
            )
            return (s, fl), None

        (state, flags), _ = jax.lax.scan(body, (state, flags), None, length=50)
        return state, flags

    flags = dict(
        ever_success=jnp.zeros((n_envs,)), ever_degrasp=jnp.zeros((n_envs,)),
        ever_engaged=jnp.zeros((n_envs,)), min_xy=jnp.full((n_envs,), 1e9),
        min_z=jnp.full((n_envs,), 1e9),
    )
    for _ in range(cfg.rl.max_episode_length // 50):
        state, flags = roll_chunk(state, flags)
    f = {k: np.asarray(v) for k, v in flags.items()}

    succ = f["ever_success"] > 0
    deg = (f["ever_degrasp"] > 0) & ~succ
    eng_stuck = (f["ever_engaged"] > 0) & ~succ & ~deg
    never = ~succ & ~deg & (f["ever_engaged"] == 0)
    print(f"n={n_envs}  success {succ.mean():.3f}  degrasp(fail) {deg.mean():.3f}  "
          f"engaged-not-inserted {eng_stuck.mean():.3f}  never-engaged {never.mean():.3f}")
    print(f"never-engaged min_xy (mm): med {np.median(f['min_xy'][never])*1000 if never.any() else float('nan'):.1f}")
    print("\nper-subassembly:")
    for k in range(int(sub_idx.max()) + 1):
        m = sub_idx == k
        if m.sum() == 0:
            continue
        name = subs.names[k] if hasattr(subs, "names") else str(k)
        print(f"  {name:28s} n={int(m.sum()):4d}  success {succ[m].mean():.3f}  "
              f"degrasp {deg[m].mean():.3f}  engaged-stuck {eng_stuck[m].mean():.3f}  "
              f"never {never[m].mean():.3f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 512,
         int(sys.argv[3]) if len(sys.argv) > 3 else 123)
