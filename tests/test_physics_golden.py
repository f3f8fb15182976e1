"""Golden-value physics tests: analytic cases for dynamics and friction."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.physics import engine
from isaacgyminsertion_tpu.physics.dynamics import bias_forces, mass_matrix
from isaacgyminsertion_tpu.physics.robot import NUM_DOFS, RobotModel, build_kuka_openhand

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()


def _pendulum_model(m=1.0, L=1.0):
    """Single revolute joint about world y; point mass at distance L below."""
    nd = 1
    ident = np.array([0.0, 0.0, 0.0, 1.0])
    return RobotModel(
        parent=np.array([-1], np.int32),
        joint_t=np.zeros((nd, 3), np.float32),
        joint_q=np.tile(ident, (nd, 1)).astype(np.float32),
        axis=np.array([[0.0, 1.0, 0.0]], np.float32),
        mass=np.array([m], np.float32),
        com=np.array([[0.0, 0.0, -L]], np.float32),
        inertia=np.zeros((nd, 3, 3), np.float32),
        armature=np.zeros(nd, np.float32),
        damping=np.zeros(nd, np.float32),
        dof_lower=np.array([-10.0], np.float32),
        dof_upper=np.array([10.0], np.float32),
        effort_limit=np.array([1e6], np.float32),
        velocity_limit=np.array([1e6], np.float32),
        ancestor_mask=np.ones((nd, nd), np.float32),
        site_body=np.array([0], np.int32),
        site_t=np.zeros((1, 3), np.float32),
        site_q=ident[None].astype(np.float32),
    )


def test_pendulum_mass_matrix_and_gravity_torque():
    """M(q) = m L² and gravity torque τ = -m g L sin(q) for a point pendulum."""
    m, L, g = 1.3, 0.7, 9.81
    model = _pendulum_model(m, L)
    for q0 in (0.0, 0.4, 1.2):
        q = jnp.asarray([[q0]])
        M = mass_matrix(model, q)
        np.testing.assert_allclose(float(M[0, 0, 0]), m * L * L, rtol=1e-5)
        # C with gravity: bias = -τ_gravity = m g L sin(q)
        C = bias_forces(model, q, jnp.zeros_like(q), gravity=-g)
        np.testing.assert_allclose(float(C[0, 0]), m * g * L * math.sin(q0),
                                   rtol=1e-4, atol=1e-5)


def test_pendulum_coriolis_is_zero_single_dof():
    model = _pendulum_model()
    q = jnp.asarray([[0.6]])
    qd = jnp.asarray([[2.0]])
    C = bias_forces(model, q, qd, gravity=0.0)
    # a single revolute dof has no Coriolis coupling
    np.testing.assert_allclose(float(C[0, 0]), 0.0, atol=1e-5)


def _table_only_setup(n=2, mu_table=0.3):
    sub_idx = jnp.zeros((n,), jnp.int32) + 5  # yellow_round_peg_2in
    params = engine.make_params(SUBS, sub_idx, n)
    params = params._replace(
        gravity=jnp.full((n,), -9.81),
        socket_pos=params.socket_pos + jnp.asarray([10.0, 0.0, 0.0]),
        contact=params.contact._replace(mu_table=jnp.asarray(mu_table)),
    )
    state = engine.initial_state(n, MODEL)
    state = state._replace(plug_pos=state.plug_pos.at[:, 2].set(0.0012))
    ctrl = engine.ControlInput(
        q_target=state.q, tau_cmd=jnp.zeros_like(state.q),
        torque_mode_mask=jnp.zeros((15,)), plug_wrench=jnp.zeros((n, 6)),
    )
    return params, state, ctrl


def test_friction_cone_static_vs_sliding():
    """Tangential push below μmg must not slide; well above must slide."""
    mu = 0.3
    params, state, ctrl = _table_only_setup(mu_table=mu)
    m = float(params.plug_mass[0])
    g = 9.81
    # settle first
    step = jax.jit(lambda p, s, c: engine.step(MODEL, p, s, c))
    for _ in range(30):
        state = step(params, state, ctrl)
    start = state.plug_pos

    def push(fx, steps=30):
        st = state
        c = ctrl._replace(plug_wrench=jnp.zeros((2, 6)).at[:, 0].set(fx))
        for _ in range(steps):
            st = step(params, st, c)
        return float(jnp.max(jnp.abs(st.plug_pos[:, 0] - start[:, 0])))

    moved_small = push(0.3 * mu * m * g)
    moved_large = push(3.0 * mu * m * g)
    assert moved_small < 5e-3, moved_small          # static friction holds
    assert moved_large > 10 * max(moved_small, 1e-4), (moved_small, moved_large)


def test_resting_penetration_is_bounded():
    """Split-impulse correction keeps penetration within ~contact slop."""
    params, state, ctrl = _table_only_setup()
    step = jax.jit(lambda p, s, c: engine.step(MODEL, p, s, c))
    for _ in range(60):
        state = step(params, state, ctrl)
    pen = float(jnp.max(params.table_height - state.plug_pos[:, 2]))
    assert pen < 1.5e-3, pen  # ≤ slop + one correction step


def test_momentum_conservation_free_flight():
    """No contact, no gravity: plug momentum is exactly preserved (mod damping)."""
    n = 2
    sub_idx = jnp.zeros((n,), jnp.int32)
    params = engine.make_params(SUBS, sub_idx, n)
    params = params._replace(socket_pos=params.socket_pos + 10.0)
    state = engine.initial_state(n, MODEL)
    state = state._replace(
        plug_pos=jnp.tile(jnp.asarray([5.0, 5.0, 5.0]), (n, 1)),
        plug_v=jnp.tile(jnp.asarray([0.1, -0.2, 0.05]), (n, 1)),
    )
    ctrl = engine.ControlInput(
        q_target=state.q, tau_cmd=jnp.zeros_like(state.q),
        torque_mode_mask=jnp.zeros((15,)), plug_wrench=jnp.zeros((n, 6)),
    )
    step = jax.jit(lambda p, s, c: engine.step(MODEL, p, s, c))
    st = state
    T = 30
    for _ in range(T):
        st = step(params, st, ctrl)
    # velocity decays only by the documented linear damping exp(-t)
    expected = np.asarray(state.plug_v) * math.exp(-T / 60.0)
    np.testing.assert_allclose(np.asarray(st.plug_v), expected, rtol=1e-3, atol=1e-5)
