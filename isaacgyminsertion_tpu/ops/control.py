"""Task/joint-space control math (parity with tasks/factory_tactile/factory_control.py).

All eight controller modes of the reference (factory_base.py:351-499 spec,
factory_control.py:40-182 math) as pure batched JAX functions producing either
PD position targets (`gym_default`, `joint_space_ik`) or commanded torques
(the six torque modes). Row convention matches the reference: arm = dofs 0:7,
gripper = dofs 7:15, gripper is ALWAYS position-PD (factory_control.py:177-178),
torque clamp ±100 (factory_control.py:180).

The batched linear algebra (J Jᵀ, M⁻¹, Λ = (J M⁻¹ Jᵀ)⁻¹) are small fixed-size
einsums/solves that XLA maps onto the MXU; no per-env loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rotations as rot

TORQUE_CLAMP = 100.0
NUM_ARM = 7


def get_pose_error(
    pos: jax.Array,
    quat: jax.Array,
    target_pos: jax.Array,
    target_quat: jax.Array,
    rot_error_type: str = "axis_angle",
):
    """Pose error target ⊖ current (geometric jacobian frame).

    Mirrors factory_control.get_pose_error(:185-219) for jacobian_type
    'geometric': position error + quaternion-difference axis-angle.
    """
    pos_error = target_pos - pos
    quat_dot = jnp.sum(quat * target_quat, axis=-1, keepdims=True)
    # shortest path
    tq = jnp.where(quat_dot < 0.0, -target_quat, target_quat)
    quat_error = rot.quat_mul(tq, rot.quat_conjugate(quat))
    if rot_error_type == "quat":
        return pos_error, quat_error
    return pos_error, rot.axis_angle_from_quat(quat_error)


def _get_delta_dof_pos(delta_pose, jacobian, ik_method: str = "dls", lambda_val: float = 0.1):
    """IK Δq from Δpose [..., 6] and jacobian [..., 6, 7] (factory_control.py:310-347)."""
    if ik_method == "pinv":
        k_val = 1.0
        J_pinv = jnp.linalg.pinv(jacobian)
        return k_val * jnp.einsum("...ij,...j->...i", J_pinv, delta_pose)
    if ik_method == "trans":
        k_val = 1.0
        return k_val * jnp.einsum("...ji,...j->...i", jacobian, delta_pose)
    if ik_method == "dls":
        JT = jnp.swapaxes(jacobian, -1, -2)
        A = jnp.einsum("...ik,...jk->...ij", jacobian, jacobian)  # J Jᵀ [..., 6, 6]
        A = A + (lambda_val**2) * jnp.eye(6, dtype=jacobian.dtype)
        from .linalg import chol_solve_small

        u = chol_solve_small(A, delta_pose)  # SPD: J Jᵀ + λ²I
        return jnp.einsum("...ij,...j->...i", JT, u)
    if ik_method == "svd":
        # adaptive SVD: damp singular values below a threshold
        k_val = 1.0
        min_singular_value = 1.0e-5
        U, S, Vh = jnp.linalg.svd(jacobian, full_matrices=False)
        S_inv = jnp.where(S > min_singular_value, 1.0 / jnp.maximum(S, min_singular_value), 0.0)
        J_pinv = jnp.einsum("...ji,...j,...kj->...ik", Vh, S_inv, U)
        return k_val * jnp.einsum("...ij,...j->...i", J_pinv, delta_pose)
    raise ValueError(f"unknown ik_method {ik_method}")


def compute_dof_pos_target(
    arm_dof_pos: jax.Array,       # [..., 7]
    fingertip_pos: jax.Array,     # [..., 3]
    fingertip_quat: jax.Array,    # [..., 4]
    jacobian: jax.Array,          # [..., 6, 7] fingertip geometric jacobian (arm cols)
    ctrl_target_fingertip_pos: jax.Array,
    ctrl_target_fingertip_quat: jax.Array,
    ctrl_target_gripper_dof_pos: jax.Array,  # [..., 8]
    ik_method: str = "dls",
):
    """PD position targets for all 15 dofs (factory_control.py:40-70)."""
    pos_error, axis_angle_error = get_pose_error(
        fingertip_pos, fingertip_quat, ctrl_target_fingertip_pos, ctrl_target_fingertip_quat
    )
    delta_pose = jnp.concatenate([pos_error, axis_angle_error], axis=-1)
    delta_arm = _get_delta_dof_pos(delta_pose, jacobian, ik_method)
    return jnp.concatenate([arm_dof_pos + delta_arm, ctrl_target_gripper_dof_pos], axis=-1)


def _gripper_pd(gripper_dof_pos, gripper_dof_vel, target, kp=10.0, kd=0.2):
    return kp * (target - gripper_dof_pos) - kd * gripper_dof_vel


def compute_dof_torque(
    cfg_ctrl: dict,
    dof_pos: jax.Array,           # [..., 15]
    dof_vel: jax.Array,
    fingertip_pos: jax.Array,
    fingertip_quat: jax.Array,
    fingertip_linvel: jax.Array,
    fingertip_angvel: jax.Array,
    left_finger_force: jax.Array,   # [..., 3]
    right_finger_force: jax.Array,
    jacobian: jax.Array,          # [..., 6, 7]
    arm_mass_matrix: jax.Array,   # [..., 7, 7]
    ctrl_target_gripper_dof_pos: jax.Array,
    ctrl_target_fingertip_pos: jax.Array,
    ctrl_target_fingertip_quat: jax.Array,
    ctrl_target_fingertip_contact_wrench: jax.Array,  # [..., 6]
):
    """Commanded torques [..., 15] for the torque-control modes
    (factory_control.py:73-182). `cfg_ctrl` keys mirror parse_controller_spec.
    """
    dtype = dof_pos.dtype
    batch = dof_pos.shape[:-1]
    tau = jnp.zeros(batch + (15,), dtype)
    arm_pos, arm_vel = dof_pos[..., :7], dof_vel[..., :7]

    if cfg_ctrl["motion_ctrl"] == "joint_space_id" or cfg_ctrl["motion_ctrl"] == "joint_space_ik":
        pos_error, axis_angle_error = get_pose_error(
            fingertip_pos, fingertip_quat, ctrl_target_fingertip_pos, ctrl_target_fingertip_quat
        )
        delta = jnp.concatenate([pos_error, axis_angle_error], axis=-1)
        dq = _get_delta_dof_pos(delta, jacobian, cfg_ctrl.get("ik_method", "dls"))
        kp = jnp.asarray(cfg_ctrl["joint_prop_gains"], dtype)
        kd = jnp.asarray(cfg_ctrl["joint_deriv_gains"], dtype)
        t_arm = kp * dq - kd * arm_vel
        if cfg_ctrl["motion_ctrl"] == "joint_space_id":
            # inertial compensation (factory_control.py:110-118)
            t_arm = jnp.einsum("...ij,...j->...i", arm_mass_matrix, t_arm)
    else:
        # task-space modes
        task_wrench = jnp.zeros(batch + (6,), dtype)
        if cfg_ctrl["motion_ctrl"] in ("task_space_impedance", "operational_space_motion", "hybrid_force_motion"):
            pos_error, axis_angle_error = get_pose_error(
                fingertip_pos, fingertip_quat, ctrl_target_fingertip_pos, ctrl_target_fingertip_quat
            )
            delta = jnp.concatenate([pos_error, axis_angle_error], axis=-1)
            kp = jnp.asarray(cfg_ctrl["task_prop_gains"], dtype)
            kd = jnp.asarray(cfg_ctrl["task_deriv_gains"], dtype)
            vel = jnp.concatenate([fingertip_linvel, fingertip_angvel], axis=-1)
            w_motion = kp * delta - kd * vel
            axes = jnp.asarray(cfg_ctrl.get("motion_ctrl_axes", [1] * 6), dtype)
            if cfg_ctrl["motion_ctrl"] in ("operational_space_motion", "hybrid_force_motion"):
                # Λ = (J M⁻¹ Jᵀ)⁻¹ (factory_control.py:143-148)
                Minv = jnp.linalg.inv(arm_mass_matrix)
                JMiJT = jnp.einsum("...ik,...kl,...jl->...ij", jacobian, Minv, jacobian)
                lam = jnp.linalg.inv(JMiJT)
                w_motion = jnp.einsum("...ij,...j->...i", lam, w_motion)
            task_wrench = task_wrench + axes * w_motion

        if cfg_ctrl["force_ctrl"] in ("open", "closed"):
            f_axes = jnp.asarray(cfg_ctrl.get("force_ctrl_axes", [1] * 6), dtype)
            w_target = ctrl_target_fingertip_contact_wrench
            w_force = w_target
            if cfg_ctrl["force_ctrl"] == "closed":
                # closed-loop: P on measured fingertip force (factory_control.py:158-172)
                kf = jnp.asarray(cfg_ctrl["wrench_prop_gains"], dtype)
                measured = jnp.concatenate(
                    [left_finger_force + right_finger_force, jnp.zeros(batch + (3,), dtype)], axis=-1
                )
                w_force = w_target + kf * (w_target - measured)
            task_wrench = task_wrench + f_axes * w_force

        t_arm = jnp.einsum("...ji,...j->...i", jacobian, task_wrench)

    tau = tau.at[..., :7].set(t_arm)
    tau = tau.at[..., 7:].set(
        _gripper_pd(
            dof_pos[..., 7:], dof_vel[..., 7:], ctrl_target_gripper_dof_pos,
            kp=jnp.asarray(cfg_ctrl.get("gripper_prop_gains", [10.0] * 8), dtype),
            kd=jnp.asarray(cfg_ctrl.get("gripper_deriv_gains", [0.2] * 8), dtype),
        )
    )
    return jnp.clip(tau, -TORQUE_CLAMP, TORQUE_CLAMP)


DEFAULT_CTRL_CFGS = {
    # parse_controller_spec parity (factory_base.py:351-499 + task yaml ctrl block)
    "gym_default": dict(motion_ctrl="gym_default", force_ctrl="off", ik_method="dls",
                        joint_prop_gains=[290, 208, 145, 145, 232, 204, 176],
                        joint_deriv_gains=[81, 80, 40, 43, 75, 82, 47],
                        gripper_prop_gains=[10.0] * 8, gripper_deriv_gains=[0.2] * 8),
    "joint_space_ik": dict(motion_ctrl="joint_space_ik", force_ctrl="off", ik_method="dls",
                           joint_prop_gains=[1.0] * 7, joint_deriv_gains=[0.1] * 7),
    "joint_space_id": dict(motion_ctrl="joint_space_id", force_ctrl="off", ik_method="dls",
                           joint_prop_gains=[290, 208, 145, 145, 232, 204, 176],
                           joint_deriv_gains=[81, 80, 40, 43, 75, 82, 47]),
    "task_space_impedance": dict(motion_ctrl="task_space_impedance", force_ctrl="off",
                                 motion_ctrl_axes=[1] * 6,
                                 task_prop_gains=[300, 300, 300, 50, 50, 50],
                                 task_deriv_gains=[34, 34, 34, 1.4, 1.4, 1.4]),
    "operational_space_motion": dict(motion_ctrl="operational_space_motion", force_ctrl="off",
                                     motion_ctrl_axes=[1] * 6,
                                     task_prop_gains=[200] * 6, task_deriv_gains=[10] * 6),
    "open_loop_force": dict(motion_ctrl="off", force_ctrl="open", force_ctrl_axes=[1] * 6),
    "closed_loop_force": dict(motion_ctrl="off", force_ctrl="closed", force_ctrl_axes=[1] * 6,
                              wrench_prop_gains=[0.1] * 6),
    "hybrid_force_motion": dict(motion_ctrl="hybrid_force_motion", force_ctrl="open",
                                motion_ctrl_axes=[1] * 6, task_prop_gains=[40] * 6,
                                task_deriv_gains=[8] * 6, force_ctrl_axes=[1] * 6,
                                wrench_prop_gains=[0.1] * 6),
}
for _name, _cfg in DEFAULT_CTRL_CFGS.items():
    _cfg.setdefault("gripper_prop_gains", [10.0] * 8)
    _cfg.setdefault("gripper_deriv_gains", [0.2] * 8)
