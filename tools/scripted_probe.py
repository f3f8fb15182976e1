"""Scripted-insertion feasibility probe.

Drives a privileged P-controller (plug pose → socket tip, privileged state,
no learning) through the jitted env step and reports whether the success
condition (_check_plug_inserted_in_socket parity: 5 mm below socket tip,
5 mm XY) is physically reachable under the contact solver at the real
clearances. Run this before long training: if a scripted servo cannot
insert, PPO cannot either.

Usage: python tools/scripted_probe.py [--envs 64] [--steps 500] [--no-dr]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

# NOTE: do NOT use PYTHONPATH for this (it breaks the axon TPU plugin
# registration in this environment); a runtime sys.path insert is safe.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.ops import rotations as rot
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand


def scripted_action(cfg, state):
    """P-controller: move plug bottom toward a point just above the hole,
    descend when aligned, and null the plug-vs-socket tilt."""
    phys, params = state.phys, state.params
    socket_tip = rot.translate_along_local_z(
        params.socket_pos, params.socket_quat, params.socket_height
    )
    xy_err = socket_tip[:, :2] - phys.plug_pos[:, :2]
    aligned = jnp.linalg.norm(xy_err, axis=-1) < 0.002
    # target z: hover 2 mm above the tip until aligned, then descend to the base
    z_target = jnp.where(
        aligned, params.socket_pos[:, 2] - 0.002, socket_tip[:, 2] + 0.002
    )
    z_err = z_target - phys.plug_pos[:, 2]
    pos_err = jnp.concatenate([xy_err, z_err[:, None]], axis=-1)
    pos_act = pos_err / jnp.asarray(cfg.rl.pos_action_scale)

    q_err = rot.quat_mul(params.socket_quat, rot.quat_conjugate(phys.plug_quat))
    q_err = q_err * jnp.sign(q_err[:, 3:4] + 1e-12)  # shortest arc
    angle = 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(q_err[:, :3], axis=-1), 0.0, 1.0))
    axis = q_err[:, :3] / jnp.maximum(jnp.linalg.norm(q_err[:, :3], axis=-1, keepdims=True), 1e-9)
    rot_act = axis * angle[:, None] / jnp.asarray(cfg.rl.rot_action_scale)
    return jnp.clip(jnp.concatenate([pos_act, rot_act], axis=-1), -1.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--no-dr", action="store_true")
    args = ap.parse_args()

    cfg = default_task_config()
    if args.no_dr:
        cfg = cfg.replace(randomize=dataclasses.replace(
            cfg.randomize, domain_randomize=False))
    model = build_kuka_openhand()
    subs = build_subassembly_set()

    state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(0), args.envs)

    @jax.jit
    def probe_chunk(state):
        def body(s, _):
            act = scripted_action(cfg, s)
            s, out = insertion.step(cfg, model, subs, s, act)
            socket_tip = rot.translate_along_local_z(
                s.params.socket_pos, s.params.socket_quat, s.params.socket_height
            )
            xy = jnp.linalg.norm(s.phys.plug_pos[:, :2] - socket_tip[:, :2], axis=-1)
            depth = socket_tip[:, 2] - s.phys.plug_pos[:, 2]
            return s, dict(
                success=s.success_reset_buf.astype(jnp.float32),
                degrasp=s.degrasp_buf.astype(jnp.float32),
                xy=xy, depth=depth,
            )

        return jax.lax.scan(body, state, None, length=50)

    ever_success = np.zeros((args.envs,))
    ever_degrasp = np.zeros((args.envs,))
    for chunk in range(args.steps // 50):
        state, tr = probe_chunk(state)
        tr = jax.tree_util.tree_map(np.asarray, tr)
        ever_success = np.maximum(ever_success, tr["success"].max(axis=0))
        ever_degrasp = np.maximum(ever_degrasp, tr["degrasp"].max(axis=0))
        t = (chunk + 1) * 50
        print(
            f"step {t:4d}  success {ever_success.mean():.3f}  "
            f"degrasp {ever_degrasp.mean():.3f}  "
            f"xy med {np.median(tr['xy'][-1]) * 1000:6.2f} mm  "
            f"p25 {np.percentile(tr['xy'][-1], 25) * 1000:6.2f} mm  "
            f"depth med {np.median(tr['depth'][-1]) * 1000:6.2f} mm  "
            f"max {np.max(tr['depth'][-1]) * 1000:6.2f} mm",
            flush=True,
        )
    print(f"FINAL success={ever_success.mean():.3f} degrasp={ever_degrasp.mean():.3f}")


if __name__ == "__main__":
    main()
