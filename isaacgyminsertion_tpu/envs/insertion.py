"""FactoryTaskInsertionTactile, TPU-native: the full MDP as one pure jitted step.

Replaces the reference's L1-L4 stack (vec_task.py + factory_base.py +
factory_env_insertion.py + factory_task_insertion.py, SURVEY.md §3.2) with a
single functional environment:

    state' , out = step(cfg, model, subs, state, policy_actions)

Everything that the reference does with Python-side buffers, per-env loops and
property APIs is here a fixed-shape array program: masked resets, action
latency queues, observation staleness, domain randomization, rewards, success/
failure detection. The whole env batch [N, ...] lives in one jit graph, so a
PPO rollout is `lax.scan(step)` with zero host round-trips (north-star design,
SURVEY.md §7.3.6).

Reset semantics follow the predefined-grasp path (factory_task_insertion.py:
1221-1255): instead of replaying the reference's recorded `initial_grasp_data`
npz datasets, resets sample the same distribution analytically — socket pose
from socket_pos_xy_initial + noise, plug grasped under the fingertip-centered
frame with plug_pos_z / rot noise, hand dofs at closed-with-noise — which is
what the grasp datasets encode (SURVEY.md §2.1 grasp-generation task).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..assets import SubassemblySet
from ..ops import control as ctrlmod
from ..ops import f32_matmul
from ..ops import rotations as rot
from ..physics import engine
from ..physics.engine import ControlInput, PhysicsParams, PhysicsState
from ..physics.kinematics import forward_kinematics, point_jacobian, site_pose
from ..physics.robot import SITE_FINGERTIP_CENTERED, RobotModel
from ..sensors import camera as cam_mod
from ..sensors import contact_gt as cgt_mod
from ..sensors import pcl as pcl_mod
from ..sensors import tactile as tact_mod
from . import dr as dr_mod
from .config import TaskConfig

ACTION_QUEUE_LEN = 16  # action_latency_max 15 + current (FactoryTaskInsertionTactile.yaml:61)


class EnvState(NamedTuple):
    """Complete per-env episode state; every leaf is [N, ...]."""

    phys: PhysicsState
    params: PhysicsParams          # DR-randomized per episode
    rng: jax.Array                 # [N, 2] per-env fold-in keys? single key [2]
    sub_idx: jax.Array             # [N] subassembly row per env
    progress: jax.Array            # [N] i32 steps since reset
    frame: jax.Array               # [N] i32 global frame (decimation phase)
    global_step: jax.Array         # [] i32 total policy steps (schedules)
    # action pipeline
    actions: jax.Array             # [N, 6] current policy actions
    prev_actions: jax.Array        # [N, 6]
    applied_actions: jax.Array     # [N, 6] EMA-smoothed applied actions
    actions_queue: jax.Array       # [N, Q, 6] newest at index 0
    action_latency: jax.Array      # [N] i32
    targets: jax.Array             # [N, 6] accumulated pose targets (logging parity)
    gripper_target: jax.Array      # [N, 8] held grasp closure targets (set at reset)
    # observation staleness state
    obs_queue: jax.Array           # [N, hist*obs]
    obs_stud_queue: jax.Array      # [N, hist*obs_stud]
    obs_plug_pos_freq: jax.Array   # [N, 3] decimated plug pos
    obs_plug_quat_freq: jax.Array  # [N, 4]
    obs_plug_pos: jax.Array        # [N, 3] decimated + delayed plug pos
    obs_plug_quat: jax.Array       # [N, 4]
    plug_pose_refresh_rate: jax.Array    # [N] i32 in [1, max_object_skip_obs]
    plug_pose_refresh_offset: jax.Array  # [N] i32
    # episode reference snapshots
    plug_hand_pos_init: jax.Array  # [N, 3]
    plug_hand_quat_init: jax.Array # [N, 4]
    plug_pos_init: jax.Array       # [N, 3] (degrasp reference)
    # raw correlated DR noise samples, held per randomization window
    # (refreshed by the reset path; envs/dr.py)
    obs_noise_corr: jax.Array      # [N, obs_dim]
    act_noise_corr: jax.Array      # [N, 6]
    finger_forces_ema: jax.Array   # [N, 3] normalized fingertip force EMA
    rb_force: jax.Array            # [N, 3] decaying random plug force (Dactyl DR)
    # termination
    reset_buf: jax.Array           # [N] bool
    success_reset_buf: jax.Array   # [N] bool
    timeout_reset_buf: jax.Array   # [N] bool
    degrasp_buf: jax.Array         # [N] bool
    far_from_goal_buf: jax.Array   # [N] bool
    progress_change_tracker: jax.Array  # [N] i32 (reset_at_success counter)
    ep_reward: jax.Array           # [N] running episode reward
    # sensor FIFO queues (zero-sized [N, 0] when the modality is off)
    tactile_queue: jax.Array       # [N, Th, F, H, W, C]
    img_queue: jax.Array           # [N, Ih, H, W]
    seg_queue: jax.Array           # [N, Ih, H, W] (float of int ids)
    pcl_queue: jax.Array           # [N, Ih, P, 3]
    contact_queue: jax.Array       # [N, Ch, P]
    tactile_refresh_rate: jax.Array    # [N] i32
    tactile_refresh_offset: jax.Array  # [N] i32
    img_refresh_rate: jax.Array        # [N] i32
    img_refresh_offset: jax.Array      # [N] i32


class StepOutput(NamedTuple):
    obs: jax.Array            # [N, hist*15]
    student_obs: jax.Array    # [N, hist*15]
    priv_info: jax.Array      # [N, 64]
    rew: jax.Array            # [N]
    reset: jax.Array          # [N] bool
    timeout: jax.Array        # [N] bool
    extras: dict[str, jax.Array]
    # sensor modalities (obs_dict augmentation, factory_task_insertion.py:
    # 2126-2144); zero-sized arrays when the modality is off
    tactile: jax.Array        # [N, Th, F, H, W, C]
    img: jax.Array            # [N, Ih, H, W]
    seg: jax.Array            # [N, Ih, H, W]
    pcl: jax.Array            # [N, Ih, P, 3]
    contacts: jax.Array       # [N, Ch, P]


# --------------------------------------------------------------------------- #
# helpers
# --------------------------------------------------------------------------- #


def _uniform(key, shape, lo, hi, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi) if isinstance(lo, float) else (
        jax.random.uniform(key, shape, dtype) * (jnp.asarray(hi, dtype) - jnp.asarray(lo, dtype))
        + jnp.asarray(lo, dtype)
    )


def _sym_noise(key, shape, scale, dtype=jnp.float32):
    """Uniform in [-scale, scale] per component (reference's 2*(rand-0.5) @ diag)."""
    return (2.0 * jax.random.uniform(key, shape, dtype) - 1.0) * jnp.asarray(scale, dtype)


def _where(mask, new, old):
    """Masked leaf update; mask [N] broadcasts over trailing dims."""
    m = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(m, new, old)


def _masked_tree(mask, new, old):
    return jax.tree_util.tree_map(lambda a, b: _where(mask, a, b), new, old)


def world_to_robot_base(pos, quat):
    """The kuka base sits at the world origin, so robot-frame == world-frame
    (reference subtracts the base pose, factory_base.py:633-697)."""
    return pos, quat


# --------------------------------------------------------------------------- #
# reset
# --------------------------------------------------------------------------- #

_NOMINAL_IK_CACHE: dict = {}


def nominal_grasp_arm_q(model: RobotModel, target=(0.5, 0.0, 0.175)) -> "jnp.ndarray":
    """Host-side IK for the nominal reset pose: fingertip_centered over the
    socket with the tool axis down (fingertip_midpoint_rot_initial is the
    orientation the initial arm pose already realizes). Cached per model.

    The reference gets reset arm poses from recorded grasp datasets
    (factory_task_insertion.py:1223-1241); we solve the same pose analytically
    (nominal here + per-env in-graph refinement in _sample_episode).
    """
    key = (id(model), tuple(round(t, 4) for t in target))
    if key in _NOMINAL_IK_CACHE:
        return _NOMINAL_IK_CACHE[key]
    import numpy as np

    q = jnp.asarray((0.0064, 0.2375, -0.0075, -1.2022, 0.0015, 1.69, -1.5699))
    q = jnp.concatenate([q, jnp.zeros(8)])[None]
    tgt = jnp.asarray(target)[None]
    for _ in range(30):
        fk = forward_kinematics(model, q)
        fq, ft = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
        J = point_jacobian(model, fk, ft, 6)[..., :7]
        err = jnp.concatenate([tgt - ft, jnp.zeros((1, 3))], axis=-1)
        dq = ctrlmod._get_delta_dof_pos(err, J, "dls")
        q = q.at[:, :7].add(jnp.clip(dq, -0.2, 0.2))
    out = np.asarray(q[0, :7])
    _NOMINAL_IK_CACHE[key] = out
    return out


def _gather_shape_rows(subs: SubassemblySet, sub_idx: jax.Array) -> dict:
    g = lambda a: jnp.asarray(a)[sub_idx]
    return dict(
        kind_onehot=g(subs.kind_onehot),
        plug_hx=g(subs.plug_hx),
        plug_hy=g(subs.plug_hy),
        plug_length=g(subs.plug_length),
        plug_scale=g(subs.plug_scale),
        hole_hx=g(subs.hole_hx),
        hole_hy=g(subs.hole_hy),
        socket_height=g(subs.socket_height),
        surface_points=g(subs.surface_points),
        surface_weights=g(subs.surface_weights),
        plug_mass=g(subs.plug_mass),
        plug_inertia=g(subs.plug_inertia),
        plug_com_z=g(subs.plug_com_z),
        friction=g(subs.friction),
    )


def _sample_episode(
    cfg: TaskConfig,
    model: RobotModel,
    subs: SubassemblySet,
    key: jax.Array,
    n: int,
    sub_idx: jax.Array,
    base_params: PhysicsParams,
    grasp_data=None,
    global_step: jax.Array | None = None,
) -> tuple[PhysicsState, PhysicsParams, dict]:
    """Sample fresh episode state for ALL envs (callers mask into the batch)."""
    if global_step is None:
        global_step = jnp.zeros((), jnp.int32)
    rz = cfg.randomize
    keys = jax.random.split(key, 13)
    rows = _gather_shape_rows(subs, sub_idx)

    # ---- socket pose (factory_task_insertion.py:1591-1640 distribution)
    sock_xy = jnp.asarray(rz.socket_pos_xy_initial) + _sym_noise(keys[0], (n, 2), rz.socket_pos_xy_noise)
    sock_z = cfg.sim.table_height + _uniform(
        keys[1], (n,), float(rz.socket_pos_z_noise_bounds[0]), float(rz.socket_pos_z_noise_bounds[1])
    )
    socket_pos = jnp.concatenate([sock_xy, sock_z[:, None]], axis=-1)
    sock_eul = _sym_noise(keys[2], (n, 3), rz.socket_rot_euler_noise)
    socket_quat = rot.quat_from_euler_xyz(sock_eul[..., 0], sock_eul[..., 1], sock_eul[..., 2])

    # ---- robot dofs: IK-placed arm + openhand closed-with-noise.
    # The reference resets from recorded grasp datasets whose rows put the
    # grasped plug base U[0.05, 0.08] m above the socket
    # (plug_pos_z_noise_bounds); we reproduce that pose analytically: nominal
    # host-side IK + 3 in-graph dls refinements toward the per-env target.
    oh = cfg.env.openhand
    grip_depth = rows["plug_length"] * 0.8
    plug_base_z = sock_z + rows["socket_height"] + _uniform(
        keys[10], (n,), float(rz.plug_pos_z_noise_bounds[0]), float(rz.plug_pos_z_noise_bounds[1])
    )
    plug_xy = sock_xy + _sym_noise(keys[11], (n, 2), rz.plug_pos_xy_noise)
    ftc_target = jnp.concatenate(
        [plug_xy, (plug_base_z + grip_depth)[:, None]], axis=-1
    )
    q_arm = jnp.tile(jnp.asarray(nominal_grasp_arm_q(model), jnp.float32), (n, 1))
    prox = oh.proximal_close + _sym_noise(keys[3], (n, 3), oh.proximal_noise)
    dist = oh.distal_close + _sym_noise(keys[4], (n, 3), oh.distal_noise)
    base = jnp.full((n, 1), oh.base_angle)
    q_hand = jnp.concatenate(
        [base, prox[:, :1], dist[:, :1], -base, prox[:, 1:2], dist[:, 1:2], prox[:, 2:], dist[:, 2:]],
        axis=-1,
    )
    q = jnp.concatenate([q_arm, q_hand], axis=-1)
    for _ in range(3):  # per-env IK refinement (position only)
        fk = forward_kinematics(model, q)
        fq_i, ft_i = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
        J = point_jacobian(model, fk, ft_i, 6)[..., :7]
        err = jnp.concatenate([ftc_target - ft_i, jnp.zeros((n, 3))], axis=-1)
        dq = ctrlmod._get_delta_dof_pos(err, J, "dls")
        q = q.at[:, :7].add(jnp.clip(dq, -0.2, 0.2))

    # ---- grasp-dataset override (reference predefined-grasp path,
    # factory_task_insertion.py:1223-1241): sampled rows replace the analytic
    # IK pose for envs whose subassembly has recorded rows
    if grasp_data is not None:
        counts = jnp.asarray(grasp_data.count)[sub_idx]
        row = (jax.random.uniform(keys[12], (n,)) * jnp.maximum(counts, 1)).astype(jnp.int32)
        q_gd = jnp.asarray(grasp_data.dof_pos)[sub_idx, row]
        s_pos_gd = jnp.asarray(grasp_data.socket_pos)[sub_idx, row]
        s_quat_gd = jnp.asarray(grasp_data.socket_quat)[sub_idx, row]
        has = (counts > 0)
        q = _where(has, q_gd, q)
        socket_pos = _where(has, s_pos_gd, socket_pos)
        socket_quat = _where(has, s_quat_gd, socket_quat)

    # ---- plug pose: grasped below the fingertip-centered frame
    fk = forward_kinematics(model, q)
    ftc_q, ftc_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
    # plug z-axis along the (downward-pointing) tool axis; base `grip_depth`
    # above the fingertips so the plug body hangs below the grasp center
    plug_eul = _sym_noise(keys[5], (n, 3), rz.plug_rot_noise)
    dq = rot.quat_from_euler_xyz(plug_eul[..., 0], plug_eul[..., 1], plug_eul[..., 2])
    plug_quat = rot.quat_unit(dq)  # world-frame: plug +z up with noise
    grasp_off = _sym_noise(keys[6], (n, 3), (rz.grasp_plug_noise,) * 3)
    # grasp around the top third of the plug
    plug_pos = ftc_t + grasp_off - rot.quat_apply(
        plug_quat,
        jnp.stack([jnp.zeros((n,)), jnp.zeros((n,)), rows["plug_length"] * 0.8], -1),
    )
    if grasp_data is not None:
        # plug rides the recorded plug-in-hand offset of the sampled row
        ph_pos = jnp.asarray(grasp_data.plug_pos_hand)[sub_idx, row]
        ph_quat = jnp.asarray(grasp_data.plug_quat_hand)[sub_idx, row]
        pq_gd, pp_gd = rot.tf_combine(ftc_q, ftc_t, ph_quat, ph_pos)
        plug_pos = _where(has, pp_gd, plug_pos)
        plug_quat = _where(has, pq_gd, plug_quat)

    # ---- close the hand ONTO the plug: per-finger bisection of the closure
    # fraction until each pad's PREDICTED GEL FORCE (patch spring model, the
    # same k/PATCH_POINTS·Σdepth the solver will apply) hits a common target.
    # The reference closes the hand under simulation (staged close,
    # factory_task_insertion.py:1955-1973); a teleported fixed closure
    # interpenetrates wide plugs by >1 cm and the gel springs eject the plug.
    # Equal-FORCE (not equal-depth) closure matters: pad/plug geometry makes
    # equal indentations carry unequal patch forces, and the unbalanced net
    # torque slowly rolls the plug out of the grasp.
    from ..physics.contact import (
        GEL_STIFFNESS,
        PATCH_POINTS,
        fingertip_plug_contacts,
    )

    prox_idx = jnp.asarray([8, 11, 13])
    dist_idx = jnp.asarray([9, 12, 14])
    prox_closed = q[:, prox_idx]
    dist_closed = q[:, dist_idx]

    def hand_at(f):
        qf = q.at[:, prox_idx].set(oh.proximal_open + f * (prox_closed - oh.proximal_open))
        return qf.at[:, dist_idx].set(oh.distal_open + f * (dist_closed - oh.distal_open))

    com_w = plug_pos + rot.quat_apply(
        plug_quat,
        jnp.stack([jnp.zeros((n,)), jnp.zeros((n,)), rows["plug_com_z"]], -1),
    )

    def pad_force(qf):
        fkh = forward_kinematics(model, qf)
        _, tips = engine.fingertip_poses(model, fkh)
        cs_f, _ = fingertip_plug_contacts(
            tips, jnp.zeros_like(tips), plug_quat, plug_pos, com_w,
            rows["kind_onehot"], rows["plug_hx"], rows["plug_hy"],
            rows["plug_length"], base_params.contact,
        )
        d = jnp.maximum(cs_f.depth, 0.0).reshape(n, 3, PATCH_POINTS)
        return (GEL_STIFFNESS / PATCH_POINTS) * jnp.sum(d, axis=-1)  # [n, 3] N

    target_force = 5.0  # N per pad predicted by the patch spring model —
    # lands the pad centers at ≈2.5 mm indentation (AllSight working range
    # 0-10 N); the per-finger balance is what matters (see above)
    lo = jnp.zeros((n, 3))
    hi = jnp.ones((n, 3))
    for _ in range(12):
        mid = 0.5 * (lo + hi)
        too_deep = pad_force(hand_at(mid)) > target_force
        hi = jnp.where(too_deep, mid, hi)
        lo = jnp.where(too_deep, lo, mid)
    f_touch = 0.5 * (lo + hi)
    q = hand_at(f_touch)
    # PD closure target slightly past touching keeps the grip active
    gripper_target = hand_at(jnp.minimum(f_touch + 0.04, 1.0))[:, 7:]

    # ---- DR over physics params (setup randomizations, SURVEY.md §2.1)
    # socket scale DR (FactoryEnvInsertionTactile.yaml actor_params.socket.
    # scale 1.0-1.1, setup_only): enlarges the hole cross-section — this is
    # what makes the tightest fits (0.1-0.6 mm clearance) insertable and is
    # part of the reference's own randomization
    sock_scale = _uniform(keys[12], (n,), float(rz.socket_scale[0]), float(rz.socket_scale[1])) \
        if grasp_data is None else _uniform(jax.random.fold_in(keys[11], 7), (n,),
                                            float(rz.socket_scale[0]), float(rz.socket_scale[1]))
    if rz.clearance_curriculum_extra > 0.0:
        # clearance curriculum (RandomizeConfig): loose hole early, true fit
        # after `clearance_curriculum_steps` — decays the extra scale linearly
        remain = 1.0 - jnp.minimum(
            global_step.astype(jnp.float32) / float(rz.clearance_curriculum_steps), 1.0)
        sock_scale = sock_scale * (1.0 + float(rz.clearance_curriculum_extra) * remain)
    mass_scale = _uniform(keys[7], (n,), float(rz.plug_mass_scale[0]), float(rz.plug_mass_scale[1]))
    plug_fric_scale = _uniform(keys[8], (n,), float(rz.plug_friction_scale[0]), float(rz.plug_friction_scale[1]))
    sock_fric = _uniform(keys[9], (n,), float(rz.socket_friction_scale[0]), float(rz.socket_friction_scale[1]))
    from ..assets import PLUG_FRICTION

    mu_plug = PLUG_FRICTION * plug_fric_scale
    base_contact = base_params.contact
    contact = base_contact._replace(
        mu_socket=0.5 * (mu_plug + sock_fric),            # PhysX-style pair average
        mu_table=0.5 * (mu_plug + cfg.sim.table_friction),
        mu_finger=0.5 * (mu_plug + cfg.sim.kuka_friction),
    )

    gravity = jnp.full((n,), 0.0 if cfg.sim.disable_gravity else cfg.sim.gravity, jnp.float32)
    if cfg.randomize.domain_randomize and not cfg.sim.disable_gravity:
        # sim_params.gravity DR (vec_task.py:736-748: additive gaussian 0.4),
        # refreshed once per randomization window = per episode here. Skipped
        # when disable_gravity: the reference plug actor has
        # disable_gravity=True (factory_env_insertion.py:665), so its
        # sim-param gravity DR never perturbs the plug — applying noise here
        # would give the gravity-free plug a random constant acceleration.
        kg = jax.random.fold_in(keys[10], 3)
        gravity = dr_mod.apply_noise(
            cfg.randomize.gravity, kg,
            dr_mod.sample_correlated(cfg.randomize.gravity,
                                     jax.random.fold_in(kg, 1), (n,)),
            gravity, global_step,
        )

    params = base_params._replace(
        kind_onehot=rows["kind_onehot"],
        plug_hx=rows["plug_hx"],
        plug_hy=rows["plug_hy"],
        plug_length=rows["plug_length"],
        hole_hx=rows["hole_hx"] * sock_scale,
        hole_hy=rows["hole_hy"] * sock_scale,
        # the reference's setup-only socket-scale DR scales the whole actor,
        # including its height (FactoryEnvInsertionTactile.yaml socket.scale)
        socket_height=rows["socket_height"] * sock_scale,
        plug_scale=rows["plug_scale"],
        socket_scale=sock_scale,
        surface_points=rows["surface_points"],
        surface_weights=rows["surface_weights"],
        plug_mass=rows["plug_mass"] * mass_scale,
        plug_inertia=rows["plug_inertia"] * mass_scale[:, None],
        plug_com_z=rows["plug_com_z"],
        socket_pos=socket_pos,
        socket_quat=socket_quat,
        table_height=jnp.full((n,), cfg.sim.table_height, jnp.float32),
        gravity=gravity,
        contact=contact,
    )

    phys = PhysicsState(
        q=q,
        qd=jnp.zeros((n, 15), jnp.float32),
        plug_pos=plug_pos,
        plug_quat=plug_quat,
        plug_v=jnp.zeros((n, 3), jnp.float32),
        plug_w=jnp.zeros((n, 3), jnp.float32),
        ctrl_torque=jnp.zeros((n, 15), jnp.float32),
        tip_forces=jnp.zeros((n, 3, 3), jnp.float32),
        tip_fn=jnp.zeros((n, 3), jnp.float32),
    )

    # physics params exposed to the priv state (see _physics_params_vec)
    aux = dict(
        mu_plug=mu_plug,
        mu_socket=sock_fric,
        ftc_q=ftc_q,
        ftc_t=ftc_t,
        mass_scale=mass_scale,
        gripper_target=gripper_target,
    )
    return phys, params, aux


def _sensor_queue_shapes(cfg: TaskConfig, subs: SubassemblySet, n: int) -> dict:
    e = cfg.env
    tcfg = tact_mod.TactileConfig()
    ccfg = cam_mod.CameraConfig()
    z = lambda *shape: jnp.zeros(shape, jnp.float32)
    # image frame queues are carried as f16: they are pure [0,1]-ranged frame
    # storage read+written every step (tactile alone is 1.2 GB at 8192 envs
    # in f32), and the ~1e-3 quantization sits far below the 0.01 DR pixel
    # noise. Consumers get f32 back at the step-output boundary.
    zh = lambda *shape: jnp.zeros(shape, jnp.float16)
    n_pcl = (e.num_points if e.include_plug_pcl else 0) + \
            (e.num_points_socket if e.merge_socket_pcl else 0) + \
            (e.num_points_goal if e.merge_goal_pcl else 0)
    return dict(
        tactile_queue=zh(n, e.tactile_history_len, 3, tcfg.height, tcfg.width,
                         tcfg.num_channels) if e.tactile else zh(n, 0),
        img_queue=zh(n, e.img_history_len, ccfg.height, ccfg.width)
        if (e.external_cam and e.depth_cam) else zh(n, 0),
        seg_queue=zh(n, e.img_history_len, ccfg.height, ccfg.width)
        if (e.external_cam and e.seg_cam) else zh(n, 0),
        pcl_queue=z(n, e.img_history_len, n_pcl, 3)
        if (e.external_cam and e.pcl_cam) else z(n, 0),
        contact_queue=z(n, e.ft_history_len, subs.dense_points.shape[1])
        if e.compute_contact_gt else z(n, 0),
    )


@f32_matmul
def reset_all(
    cfg: TaskConfig,
    model: RobotModel,
    subs: SubassemblySet,
    key: jax.Array,
    n: int,
    grasp_data=None,
) -> EnvState:
    """Build a fresh EnvState for the full batch (initial reset)."""
    k_sub, k_ep, k_lat, k_rate, k_off, k_state = jax.random.split(key, 6)
    n_sub = len(subs.names)
    sub_idx = jax.random.randint(k_sub, (n,), 0, n_sub)
    base_params = engine.make_params(subs, sub_idx, n)
    phys, params, _aux = _sample_episode(cfg, model, subs, k_ep, n, sub_idx, base_params,
                                         grasp_data=grasp_data)

    hist = cfg.env.num_obs_hist * cfg.env.num_observations
    hist_s = cfg.env.num_obs_stud_hist * cfg.env.num_obs_student
    fk = forward_kinematics(model, phys.q)
    hand_q, hand_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
    ph_pos, ph_quat = _pose_in_frame(phys.plug_pos, phys.plug_quat, hand_t, hand_q)

    state = EnvState(
        phys=phys,
        params=params,
        rng=k_state,
        sub_idx=sub_idx,
        progress=jnp.zeros((n,), jnp.int32),
        frame=jnp.zeros((n,), jnp.int32),
        global_step=jnp.zeros((), jnp.int32),
        actions=jnp.zeros((n, 6), jnp.float32),
        prev_actions=jnp.zeros((n, 6), jnp.float32),
        applied_actions=jnp.zeros((n, 6), jnp.float32),
        actions_queue=jnp.zeros((n, ACTION_QUEUE_LEN, 6), jnp.float32),
        action_latency=jax.random.randint(k_lat, (n,), 0, 2),
        targets=jnp.zeros((n, 6), jnp.float32),
        gripper_target=_aux["gripper_target"],
        obs_queue=jnp.zeros((n, hist), jnp.float32),
        obs_stud_queue=jnp.zeros((n, hist_s), jnp.float32),
        obs_plug_pos_freq=phys.plug_pos,
        obs_plug_quat_freq=phys.plug_quat,
        obs_plug_pos=phys.plug_pos,
        obs_plug_quat=phys.plug_quat,
        plug_pose_refresh_rate=jax.random.randint(k_rate, (n,), 1, cfg.env.max_object_skip_obs + 1),
        plug_pose_refresh_offset=jax.random.randint(k_off, (n,), 0, cfg.env.max_object_skip_obs),
        plug_hand_pos_init=ph_pos,
        plug_hand_quat_init=ph_quat,
        plug_pos_init=phys.plug_pos,
        obs_noise_corr=dr_mod.sample_correlated(
            cfg.randomize.observations, jax.random.fold_in(k_state, 1),
            (n, cfg.env.num_observations)),
        act_noise_corr=dr_mod.sample_correlated(
            cfg.randomize.actions, jax.random.fold_in(k_state, 2), (n, 6)),
        finger_forces_ema=jnp.zeros((n, 3), jnp.float32),
        rb_force=jnp.zeros((n, 3), jnp.float32),
        reset_buf=jnp.zeros((n,), bool),
        success_reset_buf=jnp.zeros((n,), bool),
        timeout_reset_buf=jnp.zeros((n,), bool),
        degrasp_buf=jnp.zeros((n,), bool),
        far_from_goal_buf=jnp.zeros((n,), bool),
        progress_change_tracker=jnp.zeros((n,), jnp.int32),
        ep_reward=jnp.zeros((n,), jnp.float32),
        **_sensor_queue_shapes(cfg, subs, n),
        tactile_refresh_rate=jax.random.randint(k_rate, (n,), 1, cfg.env.max_skip_tactile + 1),
        tactile_refresh_offset=jax.random.randint(k_off, (n,), 0, cfg.env.max_skip_tactile),
        img_refresh_rate=jax.random.randint(k_rate, (n,), 1, cfg.env.max_skip_img + 1),
        img_refresh_offset=jax.random.randint(k_off, (n,), 0, cfg.env.max_skip_img),
    )
    return state


def _pose_in_frame(pos, quat, frame_t, frame_q):
    inv_q, inv_t = rot.tf_inverse(frame_q, frame_t)
    return rot.tf_combine(inv_q, inv_t, quat, pos)


def _reset_idx(cfg, model, subs, state: EnvState, mask: jax.Array, key: jax.Array,
               grasp_data=None) -> EnvState:
    """Masked pure re-init of done envs (reference reset_idx, §3.4)."""
    n = mask.shape[0]
    k_sub, k_ep, k_lat, k_rate, k_off = jax.random.split(key, 5)
    n_sub = len(subs.names)
    same = cfg.randomize.same_socket
    new_sub = state.sub_idx if same else jax.random.randint(k_sub, (n,), 0, n_sub)
    sub_idx = jnp.where(mask, new_sub, state.sub_idx)
    phys_new, params_new, _aux = _sample_episode(cfg, model, subs, k_ep, n, sub_idx, state.params,
                                                 grasp_data=grasp_data,
                                                 global_step=state.global_step)

    phys = _masked_tree(mask, phys_new, state.phys)
    params = _masked_tree(mask, params_new, state.params)

    fk = forward_kinematics(model, phys_new.q)
    hand_q, hand_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
    ph_pos, ph_quat = _pose_in_frame(phys_new.plug_pos, phys_new.plug_quat, hand_t, hand_q)

    # annealed per-env action latency cap (factory_task_insertion.py:602-626)
    cur_max = jnp.minimum(
        jnp.maximum(
            (state.global_step * cfg.env.action_latency_cur_max)
            // max(cfg.env.action_latency_scheduled_steps, 1),
            1,
        ),
        cfg.env.action_latency_cur_max,
    )
    lat = (jax.random.uniform(k_lat, (n,)) * (cur_max.astype(jnp.float32) + 1.0)).astype(jnp.int32)

    zero6 = jnp.zeros((n, 6), jnp.float32)
    return state._replace(
        phys=phys,
        params=params,
        sub_idx=sub_idx,
        progress=jnp.where(mask, 0, state.progress),
        actions=_where(mask, zero6, state.actions),
        prev_actions=_where(mask, zero6, state.prev_actions),
        applied_actions=_where(mask, zero6, state.applied_actions),
        # correlated-DR window refresh (frequency 499 ≈ every episode)
        obs_noise_corr=_where(
            mask,
            dr_mod.sample_correlated(cfg.randomize.observations,
                                     jax.random.fold_in(k_rate, 11),
                                     (n, cfg.env.num_observations)),
            state.obs_noise_corr),
        act_noise_corr=_where(
            mask,
            dr_mod.sample_correlated(cfg.randomize.actions,
                                     jax.random.fold_in(k_rate, 12), (n, 6)),
            state.act_noise_corr),
        actions_queue=_where(mask, jnp.zeros_like(state.actions_queue), state.actions_queue),
        action_latency=jnp.where(mask, lat, state.action_latency),
        targets=_where(mask, zero6, state.targets),
        gripper_target=_where(mask, _aux["gripper_target"], state.gripper_target),
        obs_queue=_where(mask, jnp.zeros_like(state.obs_queue), state.obs_queue),
        obs_stud_queue=_where(mask, jnp.zeros_like(state.obs_stud_queue), state.obs_stud_queue),
        obs_plug_pos_freq=_where(mask, phys_new.plug_pos, state.obs_plug_pos_freq),
        obs_plug_quat_freq=_where(mask, phys_new.plug_quat, state.obs_plug_quat_freq),
        obs_plug_pos=_where(mask, phys_new.plug_pos, state.obs_plug_pos),
        obs_plug_quat=_where(mask, phys_new.plug_quat, state.obs_plug_quat),
        plug_pose_refresh_rate=jnp.where(
            mask, jax.random.randint(k_rate, (n,), 1, cfg.env.max_object_skip_obs + 1),
            state.plug_pose_refresh_rate,
        ),
        plug_pose_refresh_offset=jnp.where(
            mask, jax.random.randint(k_off, (n,), 0, cfg.env.max_object_skip_obs),
            state.plug_pose_refresh_offset,
        ),
        plug_hand_pos_init=_where(mask, ph_pos, state.plug_hand_pos_init),
        plug_hand_quat_init=_where(mask, ph_quat, state.plug_hand_quat_init),
        plug_pos_init=_where(mask, phys_new.plug_pos, state.plug_pos_init),
        finger_forces_ema=_where(mask, jnp.zeros((n, 3)), state.finger_forces_ema),
        rb_force=_where(mask, jnp.zeros((n, 3)), state.rb_force),
        reset_buf=jnp.where(mask, False, state.reset_buf),
        success_reset_buf=jnp.where(mask, False, state.success_reset_buf),
        timeout_reset_buf=jnp.where(mask, False, state.timeout_reset_buf),
        degrasp_buf=jnp.where(mask, False, state.degrasp_buf),
        far_from_goal_buf=jnp.where(mask, False, state.far_from_goal_buf),
        progress_change_tracker=jnp.where(mask, 0, state.progress_change_tracker),
        ep_reward=jnp.where(mask, 0.0, state.ep_reward),
        tactile_queue=_where(mask, jnp.zeros_like(state.tactile_queue), state.tactile_queue)
        if state.tactile_queue.size else state.tactile_queue,
        img_queue=_where(mask, jnp.zeros_like(state.img_queue), state.img_queue)
        if state.img_queue.size else state.img_queue,
        seg_queue=_where(mask, jnp.zeros_like(state.seg_queue), state.seg_queue)
        if state.seg_queue.size else state.seg_queue,
        pcl_queue=_where(mask, jnp.zeros_like(state.pcl_queue), state.pcl_queue)
        if state.pcl_queue.size else state.pcl_queue,
        contact_queue=_where(mask, jnp.zeros_like(state.contact_queue), state.contact_queue)
        if state.contact_queue.size else state.contact_queue,
        tactile_refresh_rate=jnp.where(
            mask, jax.random.randint(k_rate, (n,), 1, cfg.env.max_skip_tactile + 1),
            state.tactile_refresh_rate),
        tactile_refresh_offset=jnp.where(
            mask, jax.random.randint(k_off, (n,), 0, cfg.env.max_skip_tactile),
            state.tactile_refresh_offset),
        img_refresh_rate=jnp.where(
            mask, jax.random.randint(k_rate, (n,), 1, cfg.env.max_skip_img + 1),
            state.img_refresh_rate),
        img_refresh_offset=jnp.where(
            mask, jax.random.randint(k_off, (n,), 0, cfg.env.max_skip_img),
            state.img_refresh_offset),
    )


# --------------------------------------------------------------------------- #
# step
# --------------------------------------------------------------------------- #


def _socket_tip(params: PhysicsParams) -> jax.Array:
    return rot.translate_along_local_z(params.socket_pos, params.socket_quat, params.socket_height)


def _physics_params_vec(cfg, state: EnvState) -> jax.Array:
    """14-dim physics-param block of the priv state (compute_observations
    physics_params, factory_task_insertion.py:784-820) — here a pure gather
    from state arrays instead of per-env property-API reads."""
    p = state.params
    c = p.contact
    mu_plug = 2.0 * c.mu_table - cfg.sim.table_friction  # invert the pair average
    mu_socket = 2.0 * c.mu_socket - mu_plug
    finger_mu = jnp.broadcast_to(2.0 * c.mu_finger - mu_plug, mu_plug.shape)
    return jnp.stack(
        [
            p.plug_mass,
            mu_plug,
            mu_socket,
            finger_mu,
            finger_mu,
            finger_mu,
            p.plug_length,          # plug_heights
            2.0 * p.plug_hy,        # plug_depths
            2.0 * p.plug_hx,        # plug_widths
            p.socket_height,        # socket_heights
            2.0 * p.hole_hy,        # socket_depths
            2.0 * p.hole_hx,        # socket_widths
            p.plug_scale,           # plug_scale (asset-yaml scale)
            p.socket_scale,         # socket_scale (setup DR sample)
        ],
        axis=-1,
    )


@f32_matmul
def priv_info_of(cfg: TaskConfig, model: RobotModel, state: EnvState) -> jax.Array:
    """Recompute the 64-dim privileged state from the current EnvState.

    Used by trainers to form the critic input for the state *before* the first
    step of a rollout; `step` emits the same layout in StepOutput.priv_info.
    """
    phys, params = state.phys, state.params
    n = phys.q.shape[0]
    fk = forward_kinematics(model, phys.q)
    hand_q, hand_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
    socket_tip = _socket_tip(params)
    plug_tip = rot.translate_along_local_z(phys.plug_pos, phys.plug_quat, params.plug_length)
    ph_pos, ph_quat = _pose_in_frame(state.obs_plug_pos, state.obs_plug_quat, hand_t, hand_q)
    plug_pos_err, plug_quat_err = ctrlmod.get_pose_error(
        state.obs_plug_pos, state.obs_plug_quat, params.socket_pos, params.socket_quat,
        rot_error_type="quat",
    )
    from ..physics.robot import HAND_JOINT_IDX

    hand_joints = phys.q[:, jnp.asarray(HAND_JOINT_IDX)]
    return jnp.concatenate(
        [
            hand_joints, phys.q[:, :7], phys.qd[:, :7], socket_tip, params.socket_pos,
            plug_tip, phys.plug_pos, phys.plug_quat, ph_pos, ph_quat,
            plug_pos_err, plug_quat_err, _physics_params_vec(cfg, state),
        ],
        axis=-1,
    )


@f32_matmul
def step(
    cfg: TaskConfig,
    model: RobotModel,
    subs: SubassemblySet,
    state: EnvState,
    policy_actions: jax.Array,
    grasp_data=None,
    gan_params=None,
) -> tuple[EnvState, StepOutput]:
    """One control step of the full env batch. Pure; jit/scan/shard_map-safe.

    `gan_params` (flax params of models/zoo.ResnetGenerator, trained by
    algo/gan_runner.CycleGANRunner) enables the CycleGAN sim→real hook on
    rendered tactile frames before they enter the queue — the reference's
    tactile.sim2real path (factory_task_insertion.py:539-543, generator built
    at :100-124)."""
    n = policy_actions.shape[0]
    (rng, k_reset, k_lat_delay, k_scale, k_sock, k_obs_delay, k_obs_noise,
     k_act_noise, k_force, k_tact, k_img, k_pcl, k_cgt) = jax.random.split(state.rng, 13)

    # ---------------- pre-physics: reset done envs (vec_task.step → pre_physics)
    # resets are rare (1/max_episode_length steps on average): lax.cond skips
    # the whole masked-reset computation (IK refinement, DR sampling) on the
    # steps where no env is done
    state = jax.lax.cond(
        jnp.any(state.reset_buf),
        lambda s: _reset_idx(cfg, model, subs, s, s.reset_buf, k_reset,
                             grasp_data=grasp_data),
        lambda s: s,
        state,
    )

    # action DR noise (randomization_params.actions: additive gaussian 0.02
    # white + 0.01 correlated held per randomization window, vec_task.py:375)
    actions = jnp.clip(policy_actions, -1.0, 1.0)
    if cfg.randomize.domain_randomize:
        actions = dr_mod.apply_noise(cfg.randomize.actions, k_act_noise,
                                     state.act_noise_corr, actions, state.global_step)
    prev_actions = state.actions
    # latency queue: newest at slot 0 (factory_task_insertion.py:602-626)
    queue = jnp.concatenate([actions[:, None], state.actions_queue[:, :-1]], axis=1)
    lat = jnp.clip(state.action_latency, 0, ACTION_QUEUE_LEN - 1)
    delayed = jnp.take_along_axis(queue, lat[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    delay_mask = jax.random.uniform(k_lat_delay, (n, 1)) > cfg.env.action_delay_prob_max
    actions_applied = jnp.where(delay_mask, delayed, prev_actions)

    # action moving-average schedule (factory_task_insertion.py:585-600):
    # the scalar anneals upper → lower over schedule_steps, refreshed every
    # schedule_freq global steps. NOTE the reference computes and logs this
    # scalar but never blends with it (update_action_moving_average's output
    # is only written to extras); with cfg.env.action_ema (default True, a
    # documented deviation — see EnvConfig) we apply the DeXtreme-style
    # smoothing the schedule exists for:
    # a_t = ema·a_cmd + (1−ema)·a_{t−1,applied}.
    ma_lo, ma_up = cfg.env.actions_moving_average_range
    ma_steps = max(cfg.env.actions_moving_average_schedule_steps, 1)
    ma_freq = max(cfg.env.actions_moving_average_schedule_freq, 1)
    quant = (state.global_step // ma_freq) * ma_freq
    ma_frac = jnp.minimum(quant, ma_steps).astype(jnp.float32) / float(ma_steps)
    act_ma = ma_up + (ma_lo - ma_up) * ma_frac
    if cfg.env.action_ema:
        actions_applied = (act_ma * actions_applied
                           + (1.0 - act_ma) * state.applied_actions)

    # action scale DR (scale_noise_pos/rot, _apply_actions_as_ctrl_targets)
    pos_scale = jnp.asarray(cfg.rl.pos_action_scale)
    rot_scale = jnp.asarray(cfg.rl.rot_action_scale)
    if cfg.randomize.domain_randomize:
        ks1, ks2, ks3, ks4 = jax.random.split(k_scale, 4)
        pos_noise = _sym_noise(ks1, (n, 3), cfg.randomize.scale_noise_pos)
        rot_noise = _sym_noise(ks2, (n, 3), cfg.randomize.scale_noise_rot)
        pos_on = (jax.random.uniform(ks3, (n, 1)) > 1 - cfg.env.scale_pos_prob)
        rot_on = (jax.random.uniform(ks4, (n, 1)) > cfg.env.scale_rot_prob)
        pos_scale = jnp.clip(pos_scale + pos_noise * pos_on, 0.0)
        rot_scale = jnp.clip(rot_scale + rot_noise * rot_on, 0.0)
    pos_actions = actions_applied[:, :3] * pos_scale
    rot_actions = actions_applied[:, 3:6] * rot_scale

    # ---------------- control targets → q_target (IK, gym_default path)
    fk = forward_kinematics(model, state.phys.q)
    ftc_q, ftc_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
    target_pos = ftc_t + pos_actions
    angle = jnp.linalg.norm(rot_actions, axis=-1)
    axis = rot_actions / jnp.maximum(angle[:, None], 1e-9)
    dquat = rot.quat_from_angle_axis(angle, axis)
    if cfg.rl.clamp_rot:
        ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        dquat = jnp.where((angle > cfg.rl.clamp_rot_thresh)[:, None], dquat, ident)
    target_quat = rot.quat_mul(dquat, ftc_q)

    J_ftc = point_jacobian(model, fk, ftc_t, 6)[..., :7]  # [N, 6, 7]
    oh = cfg.env.openhand
    # constant closure target from reset (reference holds
    # ctrl_target_gripper_dof_pos across the episode, factory_task_insertion
    # .py:1868-1871); re-targeting the CURRENT finger pose would make the grip
    # zero-stiffness and let the plug slip laterally
    gripper_target = state.gripper_target
    q_target = ctrlmod.compute_dof_pos_target(
        state.phys.q[:, :7], ftc_t, ftc_q, J_ftc, target_pos, target_quat, gripper_target,
    )
    tau_cmd = jnp.zeros_like(q_target)
    torque_mask = jnp.zeros((15,), q_target.dtype)
    if cfg.ctrl_type != "gym_default" and cfg.ctrl_type != "joint_space_ik":
        # torque-control modes (factory_base generate_ctrl_signals → fc.
        # compute_dof_torque): arm rows torque-driven, gripper rows stay PD
        ctrl_cfg = ctrlmod.DEFAULT_CTRL_CFGS[cfg.ctrl_type]
        tip_vel6 = jnp.einsum("...ij,...j->...i", point_jacobian(model, fk, ftc_t, 6),
                              state.phys.qd)
        from ..physics.dynamics import mass_matrix as _mm

        M_arm = _mm(model, state.phys.q)[:, :7, :7]
        wrench_target = jnp.zeros((n, 6))
        if cfg.rl.unidirectional_force:
            wrench_target = wrench_target.at[:, 2].set(-1.0)
        tau_cmd = ctrlmod.compute_dof_torque(
            ctrl_cfg, state.phys.q, state.phys.qd, ftc_t, ftc_q,
            tip_vel6[..., :3], tip_vel6[..., 3:],
            state.phys.tip_forces[:, 0], state.phys.tip_forces[:, 1],
            J_ftc, M_arm, gripper_target, target_pos, target_quat, wrench_target,
        )
        torque_mask = jnp.concatenate([jnp.ones((7,)), jnp.zeros((8,))])

    # random plug disturbance wrench (OpenAI-Dactyl-style, :667-680)
    rbf = state.rb_force * (0.99 ** (cfg.sim.dt / 0.08)) if cfg.randomize.force_scale > 0 else state.rb_force * 0.0
    if cfg.randomize.force_scale > 0.0:
        kf1, kf2 = jax.random.split(k_force)
        hit = jax.random.uniform(kf1, (n, 1)) < 0.01
        new_f = jax.random.normal(kf2, (n, 3)) * state.params.plug_mass[:, None] * cfg.randomize.force_scale
        rbf = jnp.where(hit, new_f, rbf)
    wrench = jnp.concatenate([rbf, jnp.zeros((n, 3))], axis=-1)

    ctrl = ControlInput(
        q_target=q_target,
        tau_cmd=tau_cmd,
        torque_mode_mask=torque_mask,
        plug_wrench=wrench,
    )

    # ---------------- physics
    phys = engine.step(
        model, state.params, state.phys, ctrl, dt=cfg.sim.dt, n_substeps=cfg.sim.substeps,
        smooth_force=0.9 if cfg.env.smooth_force else 0.0,
        solver_iters=cfg.sim.solver_iters,
    )

    # ---------------- post-physics: derived tensors (_refresh_task_tensors)
    progress = state.progress + 1
    frame = state.frame + 1
    fk2 = forward_kinematics(model, phys.q)
    ftc_q2, ftc_t2 = site_pose(model, fk2, SITE_FINGERTIP_CENTERED)
    hand_q2, hand_t2 = ftc_q2, ftc_t2
    socket_tip = _socket_tip(state.params)
    plug_tip = rot.translate_along_local_z(phys.plug_pos, phys.plug_quat, state.params.plug_length)

    e = 0.9 if cfg.env.smooth_force else 0.0
    tip_norms = jnp.linalg.norm(phys.tip_forces, axis=-1)
    finger_forces_ema = (1 - e) * tip_norms + e * state.finger_forces_ema

    # ---------------- sensor modalities (decimation + delay, :862-887)
    tactile_queue = state.tactile_queue
    img_queue, seg_queue, pcl_queue = state.img_queue, state.seg_queue, state.pcl_queue
    contact_queue = state.contact_queue

    # render-on-demand (EnvConfig.render_capacity < 1): the decimation/delay
    # pipeline discards most frames it never consumes, so instead of rendering
    # all N envs and masking, gather the ceil(capacity·N) env rows that will
    # consume a fresh frame this step (lowest priority rank first), render
    # only those, and scatter the frames back into the queues. Consumers past
    # capacity (vanishing binomial tail when capacity ≥ the expected consume
    # fraction, except in a mass-reset burst) keep their stale frame one more
    # step; the tie-break rotates with global_step so a burst of equal-rank
    # rows (e.g. every env in its post-reset initial window) drains across
    # consecutive steps instead of starving the high indices forever.
    use_sel = 0.0 < cfg.env.render_capacity < 1.0
    # overflow telemetry: consumers past capacity keep a stale frame — safe
    # when rare, but a starved config silently changes observation statistics,
    # so count the dropped consumers per step into extras (VERDICT r2)
    render_overflow = jnp.zeros((), jnp.float32)

    def _render_sel(prio):
        k = min(n, max(8, -(-int(cfg.env.render_capacity * n) // 8) * 8))
        rotate = (jnp.arange(n) + state.global_step * 7919) % n
        return jnp.argsort(prio.astype(jnp.int32) * n + rotate)[:k]

    def _overflow_of(sel, consume):
        in_sel = jnp.zeros((n,), bool).at[sel].set(True)
        return jnp.sum((consume & ~in_sel).astype(jnp.float32))

    def _scatter_latest(sel, upd, new_rows, prev):
        rows = _where(upd[sel], new_rows, prev[sel])
        return prev.at[sel].set(rows)

    if cfg.env.tactile:
        kt1, kt2 = jax.random.split(k_tact)
        t_refresh = ((frame + state.tactile_refresh_offset) % state.tactile_refresh_rate) == 0
        t_upd = t_refresh & (jax.random.uniform(kt1, (n,)) > cfg.env.tactile_delay_prob)
        tip_q3, tip_t3 = engine.fingertip_poses(model, fk2)
        tcfg = tact_mod.TactileConfig()
        # the gel-scene plug is scaled by the asset-yaml scale column, as in
        # the reference's AllSightRenderer(scale=fix_scale)
        # (factory_env_insertion.py:1045-1052)
        psc = state.params.plug_scale
        sel_t = _render_sel(jnp.where(t_upd, 0, 1)) if use_sel else None
        if use_sel:
            render_overflow = render_overflow + _overflow_of(sel_t, t_upd)
        gt = (lambda x: x[sel_t]) if use_sel else (lambda x: x)
        timg = tact_mod.render_tactile(
            tcfg, gt(tip_q3), gt(tip_t3), gt(phys.plug_quat), gt(phys.plug_pos),
            gt(state.params.kind_onehot), gt(state.params.plug_hx * psc),
            gt(state.params.plug_hy * psc),
            gt(state.params.plug_length * psc), gt(finger_forces_ema),
            noise_key=kt2, noise_std=0.01,
        )
        if gan_params is not None:
            # CycleGAN sim→real on the rendered frames (reference
            # factory_task_insertion.py:539-543); generator is tanh-ranged
            from ..models.zoo import ResnetGenerator

            nf = timg.shape[0] * timg.shape[1]
            flat = timg.reshape((nf,) + timg.shape[2:]) * 2.0 - 1.0
            out_g = ResnetGenerator().apply(gan_params, flat)
            timg = (out_g.reshape(timg.shape) + 1.0) * 0.5
        timg = timg.astype(state.tactile_queue.dtype)
        if use_sel:
            latest = _scatter_latest(sel_t, t_upd, timg, state.tactile_queue[:, 0])
        else:
            latest = _where(t_upd, timg, state.tactile_queue[:, 0])
        tactile_queue = jnp.concatenate(
            [latest[:, None], state.tactile_queue[:, :-1]], axis=1
        )
    if cfg.env.external_cam:
        ki1, ki2, ki3, ki4 = jax.random.split(k_img, 4)
        ccfg = cam_mod.CameraConfig()
        i_refresh = ((frame + state.img_refresh_offset) % state.img_refresh_rate) == 0
        initial = progress < 10
        i_upd = i_refresh & (initial | (jax.random.uniform(ki2, (n,)) > cfg.env.img_delay_prob))
        s_upd = i_refresh & (initial | (jax.random.uniform(ki3, (n,)) > cfg.env.seg_delay_prob))
        # one gathered row set serves depth+seg+pcl (all consume on i_refresh);
        # `initial` rows rank first — they must render at least once inside the
        # 10-step post-reset window for the frozen socket-pcl capture
        sel_c = (
            _render_sel(jnp.where(initial, 0, jnp.where(i_refresh, 1, 2)))
            if use_sel else None
        )
        if use_sel:
            render_overflow = render_overflow + _overflow_of(
                sel_c, initial | i_upd | s_upd)
        gc = (lambda x: x[sel_c]) if use_sel else (lambda x: x)
        # the descending hand occludes the scene in the reference's depth/seg
        # frames (kuka actor seg id 1, factory_env_insertion.py:814-848):
        # proxy it as 3 fingertip spheres + a wrist→palm capsule.
        # Round-5 fix (student perception postmortem, ROUND5_NOTES): the
        # proxy used to end the 45 mm capsule AT the fingertip-centered
        # frame with 18 mm tip spheres — a ball swallowing the grasp region
        # that occluded ~92% of the plug's pixels (225 → ~18 at 96×54), so
        # the plug slice of the student's point cloud was noise for three
        # rounds. The real OpenHand silhouette is thin fingers below a palm:
        # end the capsule at the PALM (55% from fingertips toward the
        # wrist), radius 32 mm, and 12 mm fingertip spheres — the grasped
        # plug's exposed length reads through the finger gaps like the
        # reference's mesh render.
        cam_tips = engine.fingertip_poses(model, fk2)[1]
        cam_wrist = fk2.body_t[..., 6, :]
        cam_palm = ftc_t2 + 0.55 * (cam_wrist - ftc_t2)
        depth_n, seg_im, depth_raw = cam_mod.render_depth_seg(
            ccfg, gc(phys.plug_quat), gc(phys.plug_pos), gc(state.params.socket_quat),
            gc(state.params.socket_pos), gc(state.params.kind_onehot),
            gc(state.params.plug_hx), gc(state.params.plug_hy),
            gc(state.params.plug_length), gc(state.params.hole_hx),
            gc(state.params.hole_hy), gc(state.params.socket_height),
            gc(state.params.table_height),
            noise_key=ki1,
            tip_pos=gc(cam_tips), wrist_pos=gc(cam_wrist), hand_pos=gc(cam_palm),
            tip_radius=0.012, hand_radius=0.032,
        )
        if cfg.env.depth_cam:
            depth_h = depth_n.astype(state.img_queue.dtype)
            if use_sel:
                latest_img = _scatter_latest(sel_c, i_upd, depth_h, state.img_queue[:, 0])
            else:
                latest_img = _where(i_upd, depth_h, state.img_queue[:, 0])
            img_queue = jnp.concatenate([latest_img[:, None], state.img_queue[:, :-1]], axis=1)
        if cfg.env.seg_cam:
            kns, knp = jax.random.split(ki4)
            nr = seg_im.shape[0]
            seg_noisy = jnp.where(
                (gc(~initial) & (jax.random.uniform(kns, (nr,)) > 1 - cfg.env.seg_prob_noise))[:, None, None],
                cam_mod.seg_noise(seg_im, kns, cfg.env.seg_prob_noise), seg_im,
            ).astype(state.seg_queue.dtype)
            if use_sel:
                latest_seg = _scatter_latest(sel_c, s_upd, seg_noisy, state.seg_queue[:, 0])
            else:
                latest_seg = _where(s_upd, seg_noisy, state.seg_queue[:, 0])
            seg_queue = jnp.concatenate([latest_seg[:, None], state.seg_queue[:, :-1]], axis=1)
        if cfg.env.pcl_cam:
            kp1, kp2 = jax.random.split(k_pcl)
            dense = jnp.asarray(subs.dense_points)[gc(state.sub_idx)]
            goal_pts = gc(state.params.socket_pos)[:, None, :] + rot.quat_apply(
                gc(state.params.socket_quat)[:, None, :], dense
            )
            merged = pcl_mod.assemble_scene_pcl(
                ccfg, depth_raw, seg_im, goal_pts, kp1,
                num_plug=cfg.env.num_points, num_socket=cfg.env.num_points_socket,
                num_goal=cfg.env.num_points_goal,
                include_plug=cfg.env.include_plug_pcl,
                merge_socket=cfg.env.merge_socket_pcl,
                merge_goal=cfg.env.merge_goal_pcl,
                include_all=cfg.env.include_all_pcl,
            )
            if cfg.env.merge_socket_pcl and cfg.env.include_plug_pcl:
                # the socket slice is captured once per episode (progress < 10,
                # before the descending plug occludes it) and then frozen —
                # factory_task_insertion.py socket-pcl capture semantics
                s0 = cfg.env.num_points
                s1 = s0 + cfg.env.num_points_socket
                prev_sock = gc(state.pcl_queue[:, 0, s0:s1])
                merged = merged.at[:, s0:s1].set(
                    _where(gc(initial), merged[:, s0:s1], prev_sock)
                )
            p_noise_on = gc(~initial) & (
                jax.random.uniform(kp2, (merged.shape[0],)) > 1 - cfg.env.pcl_prob_noise)
            merged = pcl_mod.augment_pcl(merged, kp2, pcl_mod.PclAugmentConfig(), p_noise_on)
            if use_sel:
                latest_pcl = _scatter_latest(sel_c, i_upd, merged, state.pcl_queue[:, 0])
            else:
                latest_pcl = _where(i_upd, merged, state.pcl_queue[:, 0])
            pcl_queue = jnp.concatenate([latest_pcl[:, None], state.pcl_queue[:, :-1]], axis=1)
    if cfg.env.compute_contact_gt:
        dense = jnp.asarray(subs.dense_points)[state.sub_idx]
        contacts = cgt_mod.extrinsic_contact(
            dense, phys.plug_quat, phys.plug_pos, state.params.socket_quat,
            state.params.socket_pos, state.params.kind_onehot, state.params.hole_hx,
            state.params.hole_hy, state.params.socket_height, k_cgt,
        )
        contact_queue = jnp.concatenate(
            [contacts[:, None], state.contact_queue[:, :-1]], axis=1
        )

    # ---------------- observation staleness (compute_observations :753-820)
    refresh = ((frame + state.plug_pose_refresh_offset) % state.plug_pose_refresh_rate) == 0
    obs_plug_pos_freq = _where(refresh, phys.plug_pos, state.obs_plug_pos_freq)
    obs_plug_quat_freq = _where(refresh, phys.plug_quat, state.obs_plug_quat_freq)
    upd = jax.random.uniform(k_obs_delay, (n,)) > cfg.env.plug_obs_delay_prob
    obs_plug_pos = _where(upd, obs_plug_pos_freq, state.obs_plug_pos)
    obs_plug_quat = _where(upd, obs_plug_quat_freq, state.obs_plug_quat)

    # ---------------- teacher/student obs (15 = eef pos 3 + rot6d 6 + actions 6)
    eef_pos_rb, eef_quat_rb = world_to_robot_base(ftc_t2, ftc_q2)
    obs = jnp.concatenate([eef_pos_rb, rot.quat_to_rot6d(eef_quat_rb), actions], axis=-1)
    if cfg.randomize.domain_randomize:
        obs = dr_mod.apply_noise(cfg.randomize.observations, k_obs_noise,
                                 state.obs_noise_corr, obs, state.global_step)
    no = cfg.env.num_observations
    obs_queue = jnp.concatenate([state.obs_queue[:, no:], obs], axis=-1)
    obs_stud_queue = jnp.concatenate([state.obs_stud_queue[:, no:], obs], axis=-1)

    # ---------------- priv state (64 = 50 state + 14 physics params)
    ph_pos, ph_quat = _pose_in_frame(obs_plug_pos, obs_plug_quat, hand_t2, hand_q2)
    sock_priv_noise = _sym_noise(k_sock, (n, 3), cfg.env.socket_priv_obs_noise)
    plug_pos_err, plug_quat_err = ctrlmod.get_pose_error(
        obs_plug_pos, obs_plug_quat, state.params.socket_pos + sock_priv_noise,
        state.params.socket_quat, rot_error_type="quat",
    )
    from ..physics.robot import HAND_JOINT_IDX

    hand_joints = phys.q[:, jnp.asarray(HAND_JOINT_IDX)]
    priv = jnp.concatenate(
        [
            hand_joints,                        # 6
            phys.q[:, :7],                      # 7 arm_dof_pos
            phys.qd[:, :7],                     # 7 arm_dof_vel
            socket_tip,                         # 3
            state.params.socket_pos,            # 3
            plug_tip,                           # 3
            phys.plug_pos,                      # 3
            phys.plug_quat,                     # 4
            ph_pos,                             # 3
            ph_quat,                            # 4
            plug_pos_err,                       # 3
            plug_quat_err,                      # 4
            _physics_params_vec(cfg, state._replace(phys=phys)),  # 14
        ],
        axis=-1,
    )

    # ---------------- termination (_update_reset_buf :1160-1219)
    success = _check_inserted(cfg, phys, state.params, socket_tip)
    timeout = progress >= (cfg.rl.max_episode_length - 1)

    eul = rot.euler_xyz_signed(phys.plug_quat)
    degrasp = jnp.any(jnp.abs(eul) > 0.4, axis=-1)
    far = jnp.linalg.norm(phys.plug_pos - state.params.socket_pos, axis=-1) > 0.3

    reset = timeout
    if cfg.reset_at_fails:
        # env 0 always runs full episodes for logging (reference quirk, §8.5)
        reset = reset | (degrasp & (jnp.arange(n) > 0))
    tracker = state.progress_change_tracker + success.astype(jnp.int32)
    if cfg.reset_at_success:
        reset = reset | (tracker >= 100)

    # ---------------- reward (_update_rew_buf :1107-1158)
    rew, rew_terms = _compute_reward(
        cfg, state, phys, actions, prev_actions, socket_tip, success, degrasp, far,
    )
    ep_reward = state.ep_reward + rew

    extras = {
        "successes": ((timeout | degrasp | far) & success).astype(jnp.float32),
        "keypoint_reward": rew_terms["keypoint"],
        "engagement_reward": rew_terms["engagement"],
        "ori_reward": rew_terms["ori"],
        "degrasp": degrasp.astype(jnp.float32),
        "ep_reward": ep_reward,
        # annealing telemetry (reference extras['annealing/...'])
        "action_moving_average_scalar": jnp.broadcast_to(act_ma, (n,)),
        # render-on-demand starvation: env rows that wanted a fresh sensor
        # frame this step but were past render_capacity (0 when capacity=1)
        "render_overflow": jnp.broadcast_to(render_overflow, (n,)),
    }

    new_state = state._replace(
        phys=phys,
        rng=rng,
        progress=progress,
        frame=frame,
        global_step=state.global_step + 1,
        actions=actions,
        prev_actions=prev_actions,
        applied_actions=actions_applied,
        actions_queue=queue,
        targets=state.targets + jnp.concatenate([pos_actions, rot_actions], -1),
        obs_queue=obs_queue,
        obs_stud_queue=obs_stud_queue,
        obs_plug_pos_freq=obs_plug_pos_freq,
        obs_plug_quat_freq=obs_plug_quat_freq,
        obs_plug_pos=obs_plug_pos,
        obs_plug_quat=obs_plug_quat,
        finger_forces_ema=finger_forces_ema,
        rb_force=rbf,
        tactile_queue=tactile_queue,
        img_queue=img_queue,
        seg_queue=seg_queue,
        pcl_queue=pcl_queue,
        contact_queue=contact_queue,
        reset_buf=reset,
        success_reset_buf=success,
        timeout_reset_buf=timeout | reset,
        degrasp_buf=degrasp,
        far_from_goal_buf=far,
        progress_change_tracker=tracker,
        ep_reward=ep_reward,
    )
    out = StepOutput(
        obs=obs_queue,
        student_obs=obs_stud_queue,
        priv_info=priv,
        rew=rew,
        reset=reset,
        timeout=timeout,
        extras=extras,
        # queues are stored f16 (pure frame storage); consumers see f32
        tactile=tactile_queue.astype(jnp.float32),
        img=img_queue.astype(jnp.float32),
        seg=seg_queue.astype(jnp.float32),
        pcl=pcl_queue,
        contacts=contact_queue,
    )
    return new_state, out


def _check_close(cfg, phys, socket_tip):
    return jnp.linalg.norm(phys.plug_pos[:, :2] - socket_tip[:, :2], axis=-1) < cfg.rl.close_error_thresh


def _check_inserted(cfg, phys, params, socket_tip):
    """_check_plug_inserted_in_socket (:2048-2074): below tip−5mm AND within 5mm XY."""
    below = phys.plug_pos[:, 2] <= (socket_tip[:, 2] - cfg.rl.success_height_thresh)
    return below & _check_close(cfg, phys, socket_tip)


def _check_engaged(cfg, phys, socket_tip):
    below = phys.plug_pos[:, 2] < socket_tip[:, 2]
    return below & _check_close(cfg, phys, socket_tip)


def _keypoint_offsets(num_keypoints):
    return jnp.linspace(0.0, 1.0, num_keypoints)


def _compute_reward(cfg, state, phys, actions, prev_actions, socket_tip, success, degrasp, far):
    params = state.params
    action_pen = jnp.linalg.norm(actions, axis=-1)
    action_delta_pen = jnp.linalg.norm(actions - prev_actions, axis=-1)
    ori_pen = jnp.linalg.norm(phys.plug_quat - params.socket_quat, axis=-1)

    # keypoints along +z of plug/socket frames scaled by socket height
    offs = _keypoint_offsets(cfg.rl.num_keypoints) * params.socket_height[:, None]  # [N, K]
    kp_plug = phys.plug_pos[:, None, :] + rot.quat_apply(
        phys.plug_quat[:, None, :], jnp.pad(offs[..., None], ((0, 0), (0, 0), (2, 0)))
    )
    kp_sock = params.socket_pos[:, None, :] + rot.quat_apply(
        params.socket_quat[:, None, :], jnp.pad(offs[..., None], ((0, 0), (0, 0), (2, 0)))
    )
    keypoint_dist = jnp.sum(jnp.linalg.norm(kp_sock - kp_plug, axis=-1), axis=-1)
    keypoint_rew = keypoint_dist * cfg.rl.keypoint_reward_scale

    engaged = _check_engaged(cfg, phys, socket_tip)
    height_dist = phys.plug_pos[:, 2] - params.socket_pos[:, 2]
    height_rew = 1.0 / ((height_dist - cfg.rl.success_height_thresh) + 0.1)
    quat_diff = rot.quat_mul(phys.plug_quat, rot.quat_conjugate(params.socket_quat))
    rot_dist = 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(quat_diff[:, :3], axis=-1), 0.0, 1.0))
    ori_engagement = 1.0 / (jnp.abs(rot_dist) + 0.1)
    engagement = jnp.where(engaged, height_rew + ori_engagement, 0.0)
    engagement_rew = engagement * cfg.rl.engagement_reward_scale

    early_reset_rew = (far | degrasp).astype(jnp.float32) * cfg.rl.early_reset_reward_scale
    ori_rew = ori_pen * cfg.rl.ori_reward_scale
    succ_f = success.astype(jnp.float32)

    rew = (
        keypoint_rew
        + engagement_rew
        + ori_rew
        + action_pen * cfg.rl.action_penalty_scale * succ_f
        + action_delta_pen * cfg.rl.action_delta_scale * succ_f
        + early_reset_rew
    )
    return rew, {"keypoint": keypoint_rew, "engagement": engagement_rew, "ori": ori_rew}
