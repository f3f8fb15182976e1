"""Engine integration tests: stability, contact resting, grasp coupling.

One jitted step function (params/state/ctrl as traced args) is compiled once
per module and shared by every test — XLA:CPU compile time dominates otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.physics import engine
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

N = 4
MODEL = build_kuka_openhand()


@pytest.fixture(scope="module")
def setup():
    subs = build_subassembly_set()
    sub_idx = jnp.arange(N) % len(subs.names)
    params = engine.make_params(subs, sub_idx, N)
    state = engine.initial_state(N, MODEL)
    step = jax.jit(lambda p, s, c: engine.step(MODEL, p, s, c))
    return subs, params, state, step


def _hold_ctrl(q_target):
    return engine.ControlInput(
        q_target=q_target,
        tau_cmd=jnp.zeros_like(q_target),
        torque_mode_mask=jnp.zeros(15),
        plug_wrench=jnp.zeros((q_target.shape[0], 6)),
    )


def _roll(step, params, state, ctrl, n_steps):
    for _ in range(n_steps):
        state = step(params, state, ctrl)
    return jax.block_until_ready(state)


def test_step_finite_and_stable(setup):
    subs, params, state, step = setup
    ctrl = _hold_ctrl(state.q)
    state = _roll(step, params, state, ctrl, 30)
    for leaf in state:
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # robot holds its PD target
    assert float(jnp.max(jnp.abs(state.q - ctrl.q_target))) < 0.05
    # no-gravity free plug far from everything stays put
    assert float(jnp.max(jnp.abs(state.plug_v))) < 1e-3


def test_plug_falls_and_rests_on_table(setup):
    subs, params, state, step = setup
    params = params._replace(
        gravity=jnp.full_like(params.gravity, -9.81),
        # move the socket away so only the table is hit
        socket_pos=params.socket_pos + jnp.asarray([10.0, 0.0, 0.0]),
    )
    state = state._replace(plug_pos=state.plug_pos.at[:, 2].set(0.05))
    ctrl = _hold_ctrl(state.q)
    state = _roll(step, params, state, ctrl, 90)  # 1.5 s
    z = np.asarray(state.plug_pos[:, 2])
    # resting: plug base at table height (small compliant penetration allowed)
    assert np.all(z > -0.004) and np.all(z < 0.01), z
    # small residual solver jitter is fine; no macroscopic motion
    assert float(jnp.max(jnp.abs(state.plug_v))) < 0.05
    # upright (no tipping for these wide pegs dropped flat)
    up = np.asarray(state.plug_quat[:, 3])
    assert np.all(np.abs(up) > 0.97)


def test_plug_inside_socket_hole_settles(setup):
    """A plug dropped into its own socket hole slides in and rests on the table."""
    subs, params, state, step = setup
    params = params._replace(gravity=jnp.full_like(params.gravity, -9.81))
    # start plug aligned just above the socket hole
    start = params.socket_pos + jnp.asarray([0.0, 0.0, 0.02])
    state = state._replace(plug_pos=start)
    ctrl = _hold_ctrl(state.q)
    state = _roll(step, params, state, ctrl, 120)
    rel = np.asarray(state.plug_pos - params.socket_pos)
    assert np.all(np.abs(rel[:, :2]) < 0.004), rel  # stays centered in hole
    assert np.all(rel[:, 2] < 0.012), rel  # dropped through to plate bottom


def test_fingertip_grasp_applies_force(setup):
    """Closing the fingers on a plug placed at the grasp site produces contact."""
    subs, params, state, step = setup
    from isaacgyminsertion_tpu.physics.kinematics import forward_kinematics, site_pose
    from isaacgyminsertion_tpu.physics.robot import SITE_FINGERTIP_CENTERED

    fk = forward_kinematics(MODEL, state.q)
    _, tip_t = site_pose(MODEL, fk, SITE_FINGERTIP_CENTERED)
    # put plug top at the grasp center, pointing down
    plug_len = params.plug_length[:, None]
    pos = tip_t - jnp.concatenate([jnp.zeros((N, 2)), plug_len * 0.5], axis=-1)
    state = state._replace(plug_pos=pos)
    # close the hand (proximal_close 2.4, distal_close 0.4)
    q_t = state.q.at[:, [8, 11, 13]].set(2.4).at[:, [9, 12, 14]].set(0.4)
    ctrl = _hold_ctrl(q_t)
    peak_fn = 0.0
    for _ in range(60):
        state = step(params, state, ctrl)
        peak_fn = max(peak_fn, float(jnp.max(state.tip_fn)))
    for leaf in state:
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert peak_fn > 0.1  # pads made contact while closing


def test_plane_form_contact_gen_matches_vector_oracle():
    """plug_env_contacts runs in coordinate-plane (SoA) layout for TPU lane
    efficiency; its depths/normals/lever-arms must match the straightforward
    vector-form computation (quat_apply + ops/sdf vector SDF + vjp) on random
    poses across all six section kinds."""
    from isaacgyminsertion_tpu.ops import rotations as rot
    from isaacgyminsertion_tpu.ops import sdf as sdfm
    from isaacgyminsertion_tpu.physics.contact import (
        default_materials, plug_env_contacts)
    from isaacgyminsertion_tpu.assets import (
        SOCKET_PLATE_HX, SOCKET_PLATE_HY, SOCKET_PT_COUNT, TABLE_PT_IDX,
        build_subassembly_set)

    subs = build_subassembly_set()
    n_sub = subs.kind_onehot.shape[0]
    rng = np.random.default_rng(0)
    # one env per subassembly (covers all kinds present in the set)
    idx = np.arange(n_sub)
    sp = jnp.asarray(subs.surface_points[idx])
    sw = jnp.asarray(subs.surface_weights[idx])
    kind = jnp.asarray(subs.kind_onehot[idx])
    hole_hx = jnp.asarray(subs.hole_hx[idx])
    hole_hy = jnp.asarray(subs.hole_hy[idx])
    sh = jnp.asarray(subs.socket_height[idx])
    th = jnp.full((n_sub,), 0.001)

    q = rot.quat_unit(jnp.asarray(
        rng.normal(size=(n_sub, 4)).astype(np.float32)))
    pos = jnp.asarray(
        rng.normal(scale=0.01, size=(n_sub, 3)).astype(np.float32)
        + np.array([0.0, 0.0, 0.02], np.float32))
    com = pos + jnp.asarray([0.0, 0.0, 0.02])
    sq = rot.quat_unit(jnp.asarray(
        np.concatenate([np.ones((n_sub, 1)), 0.05 * rng.normal(size=(n_sub, 3))],
                       axis=1).astype(np.float32)))
    spos = jnp.asarray(rng.normal(scale=0.005, size=(n_sub, 3)).astype(np.float32))
    mat = default_materials()

    tbl = jnp.asarray(TABLE_PT_IDX)
    cs = plug_env_contacts(
        sp[:, :SOCKET_PT_COUNT], sw[:, :SOCKET_PT_COUNT],
        sp[:, tbl], sw[:, tbl], q, pos, com, sq, spos,
        kind, hole_hx, hole_hy, sh, th, mat)

    # vector-form oracle (the pre-plane implementation)
    pts = sp[:, :SOCKET_PT_COUNT]
    ps_w = pos[:, None, :] + rot.quat_apply(q[:, None, :], pts)
    inv_q, inv_t = rot.tf_inverse(sq, spos)
    p_s = inv_t[:, None, :] + rot.quat_apply(inv_q[:, None, :], ps_w)

    def sock_sdf(ps):
        return sdfm.socket_sdf(
            ps, kind[:, None, :], hole_hx[:, None], hole_hy[:, None],
            sh[:, None], jnp.float32(SOCKET_PLATE_HX), jnp.float32(SOCKET_PLATE_HY))

    d_ref, pullback = jax.vjp(sock_sdf, p_s)
    (g_ref,) = pullback(jnp.ones_like(d_ref))
    n_ref = g_ref / jnp.linalg.norm(g_ref, axis=-1, keepdims=True).clip(1e-9)
    n_ref = rot.quat_apply(sq[:, None, :], n_ref)
    r_ref = ps_w - com[:, None, :]

    Ps = SOCKET_PT_COUNT
    np.testing.assert_allclose(np.asarray(cs.depth[:, :Ps]), -np.asarray(d_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.r[:, :Ps]), np.asarray(r_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.n[:, :Ps]), np.asarray(n_ref),
                               atol=1e-5)
    # table block: world z from the plane transform
    pt_w = pos[:, None, :] + rot.quat_apply(q[:, None, :], sp[:, tbl])
    np.testing.assert_allclose(np.asarray(cs.depth[:, Ps:]),
                               np.asarray(th[:, None] - pt_w[..., 2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.n[:, Ps:, 2]), 1.0)
