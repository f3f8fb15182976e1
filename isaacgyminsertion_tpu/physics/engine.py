"""The batched physics engine: one pure `step(state) -> state` under jit+vmap.

TPU-native replacement for the IsaacGym/PhysX backend (SURVEY.md §2.9). The
whole env batch is a single pytree of [N, ...] arrays advanced by fused array
math — no per-env objects, no host round-trips. Substepping is a `lax.scan`
(static trip count), matching the reference's dt=1/60, substeps=3 + TGS-16
(FactoryBaseTactile.yaml:12-36) with:

  robot:   implicit joint-PD articulation step (dynamics.implicit_pd_step)
           + contact reaction torques J_cᵀ f from fingertip contacts
  plug:    free rigid body; contacts vs socket SDF / table / fingertip pads
           solved at velocity level by a Jacobi mass-splitting impulse solver
           with 16 iterations (physics/solver.py) — the TGS analog
  socket/table: static (poses are per-env state set at reset)

Per-env physics properties (plug mass/friction scales, socket pose, gravity)
are *data* in `PhysicsParams`, so domain randomization is a masked array
update, never a property-API loop (reference's vec_task.py:768-849).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import f32_matmul
from ..ops import rotations as rot
from .contact import (
    FINGERTIP_RADIUS,
    MaterialParams,
    concat_contacts,
    default_materials,
    fingertip_plug_contacts,
    plug_env_contacts,
)
from .dynamics import bias_forces, implicit_pd_step, mass_matrix
from .kinematics import all_com_jacobians, forward_kinematics, point_jacobian, site_pose
from .robot import (
    SITE_FINGER_1,
    SITE_FINGER_2,
    SITE_FINGER_3,
    SITE_FINGERTIP_CENTERED,
    RobotModel,
)
from .solver import position_correction, solve_contacts

FINGER_SITES = (SITE_FINGER_1, SITE_FINGER_2, SITE_FINGER_3)
FINGER_BODIES = (9, 12, 14)
SOLVER_ITERS = 16  # parity: PhysX num_position_iterations 16
# PhysX rigid-body velocity caps (maxAngularVelocity default 64 rad/s); the
# explicit gyroscopic term grows quadratically in ω, so an uncapped spin from
# a harsh contact diverges within a few substeps
MAX_ANG_VEL = 64.0
MAX_LIN_VEL = 100.0


class PhysicsState(NamedTuple):
    """Dynamic simulation state, leading axis = env batch N."""

    q: jax.Array          # [N, 15] robot dof positions
    qd: jax.Array         # [N, 15]
    plug_pos: jax.Array   # [N, 3] plug base-frame origin (world)
    plug_quat: jax.Array  # [N, 4] xyzw
    plug_v: jax.Array     # [N, 3] plug com linear velocity
    plug_w: jax.Array     # [N, 3] plug angular velocity
    ctrl_torque: jax.Array  # [N, 15] last applied drive torque (dof force sensor)
    tip_forces: jax.Array   # [N, 3, 3] smoothed fingertip contact reaction forces
    tip_fn: jax.Array       # [N, 3] fingertip normal force magnitudes


class PhysicsParams(NamedTuple):
    """Per-env static-for-the-episode physics data (all [N] / [N, ...])."""

    kind_onehot: jax.Array     # [N, K]
    plug_hx: jax.Array         # [N]
    plug_hy: jax.Array
    plug_length: jax.Array
    hole_hx: jax.Array
    hole_hy: jax.Array
    socket_height: jax.Array
    surface_points: jax.Array  # [N, P, 3]
    surface_weights: jax.Array # [N, P]
    plug_mass: jax.Array       # [N]
    plug_inertia: jax.Array    # [N, 3] diagonal, plug com frame
    plug_com_z: jax.Array      # [N]
    socket_pos: jax.Array      # [N, 3]
    socket_quat: jax.Array     # [N, 4]
    # scales reported in the priv state (reference get_actor_scale +
    # randomisation_callback, factory_task_insertion.py:1399-1409):
    # plug_scale = asset-yaml scale (drives the tactile gel-scene plug size),
    # socket_scale = setup-only DR sample already folded into hole_hx/hy/height
    plug_scale: jax.Array      # [N]
    socket_scale: jax.Array    # [N]
    table_height: jax.Array    # [N]
    gravity: jax.Array         # [N] z acceleration on the plug (0: disabled)
    kp: jax.Array              # [N, 15]
    kd: jax.Array              # [N, 15]
    contact: MaterialParams    # per-env friction coefficients


class ControlInput(NamedTuple):
    """Per-step actuation command."""

    q_target: jax.Array            # [N, 15] PD position targets
    tau_cmd: jax.Array             # [N, 15] commanded torques (torque-mode rows)
    torque_mode_mask: jax.Array    # [15] or [N, 15] 1 = torque-driven row
    plug_wrench: jax.Array         # [N, 6] external disturbance (force, torque)


def make_params(
    sub_set,
    sub_idx: jax.Array,
    n_envs: int,
    kp_arm=(290.0, 208.0, 145.0, 145.0, 232.0, 204.0, 176.0),
    kd_arm=(81.0, 80.0, 40.0, 43.0, 75.0, 82.0, 47.0),
    kp_gripper: float = 10.0,
    kd_gripper: float = 0.2,
    gravity: float = 0.0,
    dtype=jnp.float32,
) -> PhysicsParams:
    """Gather per-env shape rows from a SubassemblySet by `sub_idx` [N].

    Gains default to the reference's gym_default controller spec
    (FactoryTaskInsertionTactile.yaml ctrl.gym_default).
    """
    g = lambda a: jnp.asarray(a, dtype)[sub_idx]
    kp = jnp.tile(jnp.asarray(list(kp_arm) + [kp_gripper] * 8, dtype), (n_envs, 1))
    kd = jnp.tile(jnp.asarray(list(kd_arm) + [kd_gripper] * 8, dtype), (n_envs, 1))
    return PhysicsParams(
        kind_onehot=g(sub_set.kind_onehot),
        plug_hx=g(sub_set.plug_hx),
        plug_hy=g(sub_set.plug_hy),
        plug_length=g(sub_set.plug_length),
        hole_hx=g(sub_set.hole_hx),
        hole_hy=g(sub_set.hole_hy),
        socket_height=g(sub_set.socket_height),
        surface_points=g(sub_set.surface_points),
        surface_weights=g(sub_set.surface_weights),
        plug_mass=g(sub_set.plug_mass),
        plug_inertia=g(sub_set.plug_inertia),
        plug_com_z=g(sub_set.plug_com_z),
        socket_pos=jnp.tile(jnp.asarray([0.5, 0.0, 0.001], dtype), (n_envs, 1)),
        socket_quat=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), (n_envs, 1)),
        plug_scale=g(sub_set.plug_scale),
        socket_scale=jnp.ones((n_envs,), dtype),
        table_height=jnp.full((n_envs,), 0.001, dtype),
        gravity=jnp.full((n_envs,), gravity, dtype),
        kp=kp,
        kd=kd,
        contact=default_materials(dtype),
    )


def initial_state(n_envs: int, model: RobotModel, dtype=jnp.float32) -> PhysicsState:
    q0 = jnp.tile(
        jnp.asarray(
            # kuka_arm_initial_dof_pos (FactoryTaskInsertionTactile.yaml randomize)
            [0.0064, 0.2375, -0.0075, -1.2022, 0.0015, 1.69, -1.5699,
             # openhand: f1/f2 base at ±base_angle, proximal open, distal open
             0.7, 1.0, 0.1, -0.7, 1.0, 0.1, 1.0, 0.1],
            dtype,
        ),
        (n_envs, 1),
    )
    return PhysicsState(
        q=q0,
        qd=jnp.zeros((n_envs, 15), dtype),
        plug_pos=jnp.tile(jnp.asarray([0.5, 0.0, 0.1], dtype), (n_envs, 1)),
        plug_quat=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), (n_envs, 1)),
        plug_v=jnp.zeros((n_envs, 3), dtype),
        plug_w=jnp.zeros((n_envs, 3), dtype),
        ctrl_torque=jnp.zeros((n_envs, 15), dtype),
        tip_forces=jnp.zeros((n_envs, 3, 3), dtype),
        tip_fn=jnp.zeros((n_envs, 3), dtype),
    )


def fingertip_poses(model: RobotModel, fk):
    """World (quat, pos) of the 3 fingertip pad sites, stacked [..., 3, 4|3]."""
    qs, ts = [], []
    for s in FINGER_SITES:
        q, t = site_pose(model, fk, s)
        qs.append(q)
        ts.append(t)
    return jnp.stack(qs, axis=-2), jnp.stack(ts, axis=-2)


def _plug_inertia_world(plug_quat, inertia_diag, inverse=False):
    R = rot.quat_to_matrix(plug_quat)
    d = 1.0 / inertia_diag.clip(1e-12) if inverse else inertia_diag
    return jnp.einsum("...ij,...j,...kj->...ik", R, d, R)


def _com_of(state: PhysicsState, params: PhysicsParams):
    off = jnp.stack(
        [jnp.zeros_like(params.plug_com_z), jnp.zeros_like(params.plug_com_z), params.plug_com_z],
        axis=-1,
    )
    return state.plug_pos + rot.quat_apply(state.plug_quat, off)


@f32_matmul
def substep(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    ctrl: ControlInput,
    h: float,
    solver_iters: int = SOLVER_ITERS,
) -> PhysicsState:
    """One physics substep (vectorized over the env batch)."""
    from .dynamics import fk_jacobians_with_tangents

    fk, J, _fk_dot, J_dot = fk_jacobians_with_tangents(model, state.q, state.qd)
    M = mass_matrix(model, state.q, fk=fk, J=J)
    C = bias_forces(model, state.q, state.qd, gravity=0.0, fk=fk, J=J, J_dot=J_dot)

    _tip_q, tip_t = fingertip_poses(model, fk)  # [N, 3, 3]
    Jtips = jnp.stack(
        [point_jacobian(model, fk, tip_t[..., i, :], FINGER_BODIES[i]) for i in range(3)],
        axis=-3,
    )  # [N, 3, 6, nd]
    tip_vel = jnp.einsum("...fij,...j->...fi", Jtips[..., :3, :], state.qd)

    com_w = _com_of(state, params)

    # ---- free-velocity update (gravity + disturbance wrench)
    m = params.plug_mass[..., None]
    g_vec = jnp.stack(
        [jnp.zeros_like(params.gravity), jnp.zeros_like(params.gravity), params.gravity], -1
    )
    Iw = _plug_inertia_world(state.plug_quat, params.plug_inertia)
    I_inv_w = _plug_inertia_world(state.plug_quat, params.plug_inertia, inverse=True)
    gyro = jnp.cross(state.plug_w, jnp.einsum("...ij,...j->...i", Iw, state.plug_w))
    # light linear/angular damping (parity: sim.add_damping True,
    # FactoryBaseTactile.yaml:17); also bleeds off Jacobi solver jitter
    damp = jnp.exp(jnp.asarray(-1.0 * h, state.plug_v.dtype))
    v_free = state.plug_v * damp + h * (g_vec + ctrl.plug_wrench[..., :3] / m)
    w_free = state.plug_w * damp + h * jnp.einsum(
        "...ij,...j->...i", I_inv_w, ctrl.plug_wrench[..., 3:] - gyro
    )

    # ---- contact generation + velocity-level solve
    cs_fing, _aux = fingertip_plug_contacts(
        tip_t, tip_vel, state.plug_quat, state.plug_pos, com_w,
        params.kind_onehot, params.plug_hx, params.plug_hy, params.plug_length,
        params.contact,
    )
    from ..assets import SOCKET_PT_COUNT, TABLE_PT_IDX

    tbl_idx = jnp.asarray(TABLE_PT_IDX)
    cs_env = plug_env_contacts(
        params.surface_points[:, :SOCKET_PT_COUNT],
        params.surface_weights[:, :SOCKET_PT_COUNT],
        params.surface_points[:, tbl_idx],
        params.surface_weights[:, tbl_idx],
        state.plug_quat, state.plug_pos, com_w,
        params.socket_quat, params.socket_pos, params.kind_onehot,
        params.hole_hx, params.hole_hy, params.socket_height, params.table_height,
        params.contact,
    )
    from .contact import PATCH_POINTS

    n_fc = 3 * PATCH_POINTS
    cs = concat_contacts(cs_fing, cs_env)  # finger patches occupy slots [0:n_fc]
    # split-impulse: zero-bias velocity solve (no momentum from depenetration),
    # then positional projection. On TPU both phases run as ONE fused Pallas
    # kernel (solver_pallas.py) keeping the contact set in VMEM across all
    # iterations; elsewhere the XLA lax.scan reference path runs.
    if jax.default_backend() == "tpu":
        from .solver_pallas import solve_contacts_fused

        fused = solve_contacts_fused(params.plug_mass, I_inv_w, v_free, w_free,
                                     cs, h, iters=solver_iters)
        res = fused
        dx_corr, dth_corr = fused.dx, fused.dth
    else:
        res = solve_contacts(params.plug_mass, I_inv_w, v_free, w_free, cs, h,
                             iters=solver_iters, beta=0.0)
        dx_corr, dth_corr = position_correction(params.plug_mass, I_inv_w, cs)
    res = res._replace(
        v=jnp.clip(res.v, -MAX_LIN_VEL, MAX_LIN_VEL),
        w=jnp.clip(res.w, -MAX_ANG_VEL, MAX_ANG_VEL),
    )

    # fingertip reaction (impulse → force): patch slots summed per finger
    f_pts = (cs.n[..., :n_fc, :] * res.lam_n[..., :n_fc, None]
             + res.lam_t[..., :n_fc, :]) / h
    f_on_plug_fing = f_pts.reshape(f_pts.shape[:-2] + (3, PATCH_POINTS, 3)).sum(-2)
    tip_force = -f_on_plug_fing                      # force ON the fingertips
    tip_fn = res.lam_n[..., :n_fc].reshape(
        res.lam_n.shape[:-1] + (3, PATCH_POINTS)
    ).sum(-1) / h

    # ---- integrate plug (velocity step + positional correction)
    com_new = com_w + h * res.v + dx_corr
    rot_vec = res.w * h + dth_corr
    dq = rot.quat_mul(
        jnp.concatenate([rot_vec * 0.5, jnp.zeros_like(res.w[..., :1])], -1),
        state.plug_quat,
    )
    quat_new = rot.quat_unit(state.plug_quat + dq)
    off = jnp.stack(
        [jnp.zeros_like(params.plug_com_z), jnp.zeros_like(params.plug_com_z), params.plug_com_z],
        axis=-1,
    )
    pos_new = com_new - rot.quat_apply(quat_new, off)

    # ---- robot: contact reaction torques, then implicit PD
    tau_ext = jnp.einsum("...fik,...fi->...k", Jtips[..., :3, :], tip_force)
    q_new, qd_new, drive = implicit_pd_step(
        model, state.q, state.qd, ctrl.q_target, params.kp, params.kd, tau_ext,
        h, M, C, torque_mode_mask=ctrl.torque_mode_mask, tau_cmd=ctrl.tau_cmd,
    )

    return PhysicsState(
        q=q_new,
        qd=qd_new,
        plug_pos=pos_new,
        plug_quat=quat_new,
        plug_v=res.v,
        plug_w=res.w,
        ctrl_torque=drive,
        tip_forces=tip_force,
        tip_fn=tip_fn,
    )


@f32_matmul
def step(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    ctrl: ControlInput,
    dt: float = 1.0 / 60.0,
    n_substeps: int = 3,
    smooth_force: float = 0.9,
    solver_iters: int = SOLVER_ITERS,
) -> PhysicsState:
    """Advance one control step = `n_substeps` physics substeps (lax.scan).

    `smooth_force` EMA-filters fingertip forces across substeps (parity with
    env.smooth_force, FactoryTaskInsertionTactile.yaml:66).
    """
    h = dt / n_substeps

    def body(carry, _):
        st, tipf = carry
        new = substep(model, params, st, ctrl, h, solver_iters=solver_iters)
        tipf = smooth_force * tipf + (1.0 - smooth_force) * new.tip_forces
        return (new, tipf), None

    (final, tipf), _ = jax.lax.scan(body, (state, state.tip_forces), None, length=n_substeps)
    return final._replace(tip_forces=tipf)
