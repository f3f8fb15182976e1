"""Batched articulated rigid-body dynamics (pure JAX).

Replaces the PhysX mass-matrix/dynamics backend of the reference (SURVEY.md
§2.9). The formulation is Jacobian-based rather than Featherstone-recursive —
a deliberate TPU choice: mass matrix and bias forces become a handful of
batched einsums (MXU-friendly) instead of serial parent-chain recursions.

  M(q)      = Σ_b J_bᵀ S_b J_b          (composite via com Jacobians)
  C(q, qd)  = Σ_b J_bᵀ (S_b A_bias_b + v_b ×* S_b v_b) − J_gᵀ m g

where S_b is body b's world-frame spatial inertia about its com and
A_bias = d/dt (J qd) with qdd = 0, obtained with one jvp through FK —
autodiff supplies the Coriolis terms instead of hand-derived recursions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kinematics import FK, all_com_jacobians, body_velocities, forward_kinematics
from .robot import RobotModel


def _world_inertia(model: RobotModel, fk: FK) -> jax.Array:
    """Rotational inertia of each body about its com in world frame [..., nb, 3, 3]."""
    from ..ops.rotations import quat_to_matrix

    R = quat_to_matrix(fk.body_q)  # [..., nb, 3, 3]
    I_local = jnp.asarray(model.inertia, R.dtype)
    return jnp.einsum("...bij,bjk,...blk->...bil", R, I_local, R)


def mass_matrix(model: RobotModel, q: jax.Array, fk: FK | None = None, J: jax.Array | None = None) -> jax.Array:
    """Joint-space mass matrix [..., nd, nd] (+ armature on the diagonal)."""
    fk = forward_kinematics(model, q) if fk is None else fk
    J = all_com_jacobians(model, fk) if J is None else J
    Jv, Jw = J[..., :3, :], J[..., 3:, :]
    m = jnp.asarray(model.mass, q.dtype)
    Iw = _world_inertia(model, fk)
    M = jnp.einsum("b,...bik,...bil->...kl", m, Jv, Jv) + jnp.einsum(
        "...bik,...bij,...bjl->...kl", Jw, Iw, Jw
    )
    return M + jnp.diag(jnp.asarray(model.armature, q.dtype))


def fk_jacobians_with_tangents(model: RobotModel, q: jax.Array, qd: jax.Array):
    """One jvp pass producing (fk, J) and their time derivatives.

    The primal (fk, J) serve mass-matrix/site/contact queries; J̇ gives the
    Coriolis bias acceleration — so the whole substep needs exactly one
    linearized FK evaluation instead of three separate FK+J computations.
    """

    def f(qq):
        fk = forward_kinematics(model, qq)
        return fk, all_com_jacobians(model, fk)

    (fk, J), (fk_dot, J_dot) = jax.jvp(f, (q,), (qd,))
    return fk, J, fk_dot, J_dot


def bias_forces(
    model: RobotModel,
    q: jax.Array,
    qd: jax.Array,
    gravity: jax.Array | float = 0.0,
    fk: FK | None = None,
    J: jax.Array | None = None,
    J_dot: jax.Array | None = None,
) -> jax.Array:
    """Generalized bias forces C(q, qd) [..., nd] such that M qdd + C = tau.

    `gravity` is the world z acceleration applied to the robot's links (the
    reference imports the kuka with disable_gravity=True — pass 0 for parity,
    factory_base.py:144).
    """
    fk = forward_kinematics(model, q) if fk is None else fk
    J = all_com_jacobians(model, fk) if J is None else J
    m = jnp.asarray(model.mass, q.dtype)
    Iw = _world_inertia(model, fk)

    if J_dot is not None:
        v = jnp.einsum("...bij,...j->...bi", J, qd)
        a_bias = jnp.einsum("...bij,...j->...bi", J_dot, qd)
    else:
        v, a_bias = jax.jvp(lambda qq: body_velocities(model, qq, qd), (q,), (qd,))
    vlin, w = v[..., :3], v[..., 3:]
    alin, aw = a_bias[..., :3], a_bias[..., 3:]

    f = m[..., None] * alin  # [..., nb, 3]
    Iww = jnp.einsum("...bij,...bj->...bi", Iw, w)
    tau_b = jnp.einsum("...bij,...bj->...bi", Iw, aw) + jnp.cross(w, Iww)

    g = jnp.zeros_like(vlin).at[..., 2].add(jnp.asarray(gravity, q.dtype))
    f = f - m[..., None] * g

    wrench = jnp.concatenate([f, tau_b], axis=-1)  # [..., nb, 6]
    return jnp.einsum("...bik,...bi->...k", J, wrench)


def implicit_pd_step(
    model: RobotModel,
    q: jax.Array,
    qd: jax.Array,
    q_target: jax.Array,
    kp: jax.Array,
    kd: jax.Array,
    tau_ext: jax.Array,
    h: float,
    M: jax.Array,
    C: jax.Array,
    torque_mode_mask: jax.Array | None = None,
    tau_cmd: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One semi-implicit substep with implicitly damped joint PD.

    Solves (M + h diag(kd + d_joint)) qd' = M qd + h (tau_drive + tau_ext - C),
    where tau_drive = clip(kp (q_t - q) - kd qd, ±effort) in PD mode or the
    commanded torque in torque mode (clamped ±effort; the reference additionally
    clamps at ±100, factory_control.py:180 — callers do that).

    Returns (q', qd', applied_drive_torque).
    """
    effort = jnp.asarray(model.effort_limit, q.dtype)
    drive_pd = jnp.clip(kp * (q_target - q) - kd * qd, -effort, effort)
    if torque_mode_mask is not None and tau_cmd is not None:
        drive = jnp.where(torque_mode_mask, jnp.clip(tau_cmd, -effort, effort), drive_pd)
        # implicit damping only where PD drives; torque rows keep joint damping
        kd_eff = jnp.where(torque_mode_mask, 0.0, kd)
    else:
        drive = drive_pd
        kd_eff = kd
    d = jnp.asarray(model.damping, q.dtype)
    nd = q.shape[-1]
    lhs = M + h * jnp.eye(nd, dtype=q.dtype) * (kd_eff + d)[..., None, :]
    rhs = jnp.einsum("...ij,...j->...i", M, qd) + h * (drive + tau_ext - C)
    from ..ops.linalg import chol_solve_small

    qd_new = chol_solve_small(lhs, rhs)
    vlim = jnp.asarray(model.velocity_limit, q.dtype)
    qd_new = jnp.clip(qd_new, -vlim, vlim)
    q_new = q + h * qd_new
    q_new = jnp.clip(q_new, jnp.asarray(model.dof_lower, q.dtype), jnp.asarray(model.dof_upper, q.dtype))
    return q_new, qd_new, drive
