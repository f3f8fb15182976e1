"""Grasp-pose dataset generation (parity: factory_task_grasp.py, SURVEY.md §2.1).

The reference's FactoryTaskGraspTactile generates `initial_grasp_data/*.npz`
(socket pose, plug pose, 15-dof dof_pos per sample) by simulating
move-close-grasp loops; insertion episodes then reset from those rows
(factory_task_insertion.py:1223-1241). Here the same product is produced
batched: initialize the analytic grasp, settle under simulation with gravity
on, keep the samples where the plug stays held, and store the self-consistent
triple (dof_pos, socket pose, plug-in-hand pose).

Output format (one npz per run): sub_idx [S], dof_pos [S, 15], socket_pos/
socket_quat, plug_pos_hand/plug_quat_hand — loadable via `load_grasp_data`
into the padded per-subassembly table consumed by insertion resets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from ..physics import engine
from .config import TaskConfig


class GraspData(NamedTuple):
    """Padded per-subassembly grasp table (numpy, static under jit).

    Rows are self-consistent snapshots: dof_pos ↔ plug-in-hand offset ↔ the
    socket pose they were generated over (the reference's
    initial_grasp_data rows carry the same triple)."""

    dof_pos: np.ndarray        # [n_sub, S, 15]
    socket_pos: np.ndarray     # [n_sub, S, 3]
    socket_quat: np.ndarray    # [n_sub, S, 4]
    plug_pos_hand: np.ndarray  # [n_sub, S, 3] plug base pos in the hand frame
    plug_quat_hand: np.ndarray # [n_sub, S, 4]
    count: np.ndarray          # [n_sub] valid rows per subassembly


def generate_grasp_dataset(
    cfg: TaskConfig, model, subs, n_envs: int, n_rounds: int, out_path: str,
    seed: int = 0, settle_steps: int = 30,
) -> int:
    """Simulate grasp settling rounds and write the npz dataset."""
    from . import insertion

    rows: dict[str, list] = {
        k: []
        for k in ("sub_idx", "dof_pos", "socket_pos", "socket_quat",
                  "plug_pos_hand", "plug_quat_hand")
    }

    settle = jax.jit(
        lambda p, s, c: engine.step(model, p, s, c, dt=cfg.sim.dt, n_substeps=cfg.sim.substeps)
    )
    key = jax.random.PRNGKey(seed)
    for rnd in range(n_rounds):
        key, k = jax.random.split(key)
        state = insertion.reset_all(cfg, model, subs, k, n_envs)
        phys, params = state.phys, state.params
        # gravity ON so only genuinely held plugs survive settling
        params = params._replace(gravity=jnp.full_like(params.gravity, -9.81))
        ctrl = engine.ControlInput(
            q_target=phys.q, tau_cmd=jnp.zeros_like(phys.q),
            torque_mode_mask=jnp.zeros((15,)), plug_wrench=jnp.zeros((n_envs, 6)),
        )
        for _ in range(settle_steps):
            phys = settle(params, phys, ctrl)
        # held = plug didn't fall: base within 5 cm of its start height
        start_z = state.phys.plug_pos[:, 2]
        held = np.asarray(jnp.abs(phys.plug_pos[:, 2] - start_z) < 0.05)
        from ..physics.kinematics import forward_kinematics, site_pose
        from ..physics.robot import SITE_FINGERTIP_CENTERED

        fk = forward_kinematics(model, phys.q)
        hand_q, hand_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
        inv_q, inv_t = rot.tf_inverse(hand_q, hand_t)
        rel_q, rel_t = rot.tf_combine(inv_q, inv_t, phys.plug_quat, phys.plug_pos)
        for i in np.where(held)[0]:
            rows["sub_idx"].append(int(state.sub_idx[i]))
            rows["dof_pos"].append(np.asarray(phys.q[i]))
            rows["socket_pos"].append(np.asarray(params.socket_pos[i]))
            rows["socket_quat"].append(np.asarray(params.socket_quat[i]))
            rows["plug_pos_hand"].append(np.asarray(rel_t[i]))
            rows["plug_quat_hand"].append(np.asarray(rel_q[i]))
    st = lambda k, d: np.stack(rows[k]) if rows[k] else np.zeros((0, d))
    np.savez_compressed(
        out_path,
        sub_idx=np.asarray(rows["sub_idx"], np.int32),
        dof_pos=st("dof_pos", 15),
        socket_pos=st("socket_pos", 3),
        socket_quat=st("socket_quat", 4),
        plug_pos_hand=st("plug_pos_hand", 3),
        plug_quat_hand=st("plug_quat_hand", 4),
    )
    return len(rows["sub_idx"])


def load_grasp_data(path: str, n_sub: int, max_rows: int = 512,
                    model=None, max_ang: float = 0.4) -> GraspData:
    """Pack the npz rows into the padded per-subassembly table.

    Mirrors _initialize_grasp_poses + Euler-outlier filtering
    (factory_env_insertion.py:541-607): rows whose WORLD-frame plug Euler
    angles exceed 0.4 rad are dropped — they would trigger an immediate
    degrasp reset (|rpy| > 0.4). Our rows store the hand-relative plug pose,
    so the world pose is reconstructed from the stored dof_pos via FK when a
    robot `model` is supplied (pass `build_kuka_openhand()`).
    """
    with np.load(path) as d:
        sub_idx = d["sub_idx"]
        dof = d["dof_pos"]
        spos, squat = d["socket_pos"], d["socket_quat"]
        pos, quat = d["plug_pos_hand"], d["plug_quat_hand"]
    if model is not None and len(sub_idx):
        from ..physics.kinematics import forward_kinematics, site_pose
        from ..physics.robot import SITE_FINGERTIP_CENTERED

        fk = forward_kinematics(model, jnp.asarray(dof))
        hand_q, _ = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
        world_q = rot.quat_mul(hand_q, jnp.asarray(quat))
        eul = np.asarray(rot.euler_xyz_signed(world_q))
        keep = ~np.any(np.abs(eul) > max_ang, axis=-1)
        n_removed = int((~keep).sum())
        if n_removed:
            print(f"removed: {n_removed} grasp rows (Euler outliers > {max_ang} rad)")
        sub_idx, dof = sub_idx[keep], dof[keep]
        spos, squat, pos, quat = spos[keep], squat[keep], pos[keep], quat[keep]

    out_dof = np.zeros((n_sub, max_rows, 15), np.float32)
    out_spos = np.tile(np.asarray([0.5, 0.0, 0.001], np.float32), (n_sub, max_rows, 1))
    out_squat = np.tile(np.asarray([0, 0, 0, 1], np.float32), (n_sub, max_rows, 1))
    out_pos = np.zeros((n_sub, max_rows, 3), np.float32)
    out_quat = np.tile(np.asarray([0, 0, 0, 1], np.float32), (n_sub, max_rows, 1))
    count = np.zeros((n_sub,), np.int32)
    for s in range(n_sub):
        rows = np.where(sub_idx == s)[0][:max_rows]
        c = len(rows)
        count[s] = c
        if c:
            out_dof[s, :c] = dof[rows]
            out_spos[s, :c] = spos[rows]
            out_squat[s, :c] = squat[rows]
            out_pos[s, :c] = pos[rows]
            out_quat[s, :c] = quat[rows]
    return GraspData(dof_pos=out_dof, socket_pos=out_spos, socket_quat=out_squat,
                     plug_pos_hand=out_pos, plug_quat_hand=out_quat, count=count)
