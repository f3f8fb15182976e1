"""Round-2 parity: action EMA schedule, DR noise engine, plug/socket scales.

Reference targets: factory_task_insertion.py:585-600 (action moving average),
vec_task.py:664-748 (correlated noise + schedules + gravity DR),
factory_env_insertion.py:1045-1052 + asset yaml scale column (plug scale).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgyminsertion_tpu.assets import SUBASSEMBLIES, build_subassembly_set
from isaacgyminsertion_tpu.envs import dr as dr_mod
from isaacgyminsertion_tpu.envs import insertion as ins
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.envs.dr import NoiseSpec
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand


@pytest.fixture(scope="module")
def small_env():
    cfg = default_task_config()
    cfg = cfg.replace(sim=dataclasses.replace(cfg.sim, substeps=1, solver_iters=2))
    model = build_kuka_openhand()
    subs = build_subassembly_set(names=("yellow_round_peg_2in",))
    state = ins.reset_all(cfg, model, subs, jax.random.PRNGKey(0), 4)
    step = jax.jit(lambda s, a: ins.step(cfg, model, subs, s, a))
    return cfg, model, subs, state, step


# --------------------------------------------------------------------------- #
# action moving-average schedule
# --------------------------------------------------------------------------- #

def test_action_ema_scalar_anneals(small_env):
    cfg, model, subs, state, step = small_env
    # at step 0 the scalar is the range upper bound
    _, out0 = step(state, jnp.ones((4, 6)))
    up = cfg.env.actions_moving_average_range[1]
    lo = cfg.env.actions_moving_average_range[0]
    assert np.isclose(float(out0.extras["action_moving_average_scalar"][0]), up, atol=1e-5)
    # far past schedule_steps the scalar reaches the lower bound
    late = state._replace(global_step=jnp.asarray(
        cfg.env.actions_moving_average_schedule_steps * 2, jnp.int32))
    _, outl = step(late, jnp.ones((4, 6)))
    assert np.isclose(float(outl.extras["action_moving_average_scalar"][0]), lo, atol=1e-5)


def test_action_ema_smooths_applied_actions(small_env):
    cfg, model, subs, state, step = small_env
    # a fresh env has applied_actions = 0; one step with a full-scale action
    # must move the applied action by only ~ema (plus DR noise), not to 1.0
    st1, _ = step(state, jnp.ones((4, 6)))
    up = cfg.env.actions_moving_average_range[1]
    # the commanded action reaches the queue un-smoothed
    assert np.allclose(np.asarray(st1.actions_queue[:, 0]), 1.0, atol=0.1)
    applied = np.asarray(st1.applied_actions)
    assert np.all(np.abs(applied) < 0.6), applied  # ≪ 1: the EMA took effect
    # and the EMA memory accumulates: a second identical step moves it closer
    st2, _ = step(st1, jnp.ones((4, 6)))
    assert np.all(np.abs(np.asarray(st2.applied_actions)) >
                  np.abs(applied) - 0.05)


# --------------------------------------------------------------------------- #
# DR noise engine
# --------------------------------------------------------------------------- #

def test_correlated_noise_held_white_resampled():
    spec = NoiseSpec(range=(0.0, 0.0), range_correlated=(0.0, 0.5))
    corr = dr_mod.sample_correlated(spec, jax.random.PRNGKey(1), (8, 6))
    x = jnp.zeros((8, 6))
    gs = jnp.zeros((), jnp.int32)
    a = dr_mod.apply_noise(spec, jax.random.PRNGKey(2), corr, x, gs)
    b = dr_mod.apply_noise(spec, jax.random.PRNGKey(3), corr, x, gs)
    # white var = 0 → the noise is the held correlated sample, same both steps
    assert np.allclose(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a).max()) > 0.0


def test_white_noise_resampled():
    spec = NoiseSpec(range=(0.0, 0.5))
    corr = dr_mod.sample_correlated(spec, jax.random.PRNGKey(1), (8, 6))
    x = jnp.zeros((8, 6))
    gs = jnp.zeros((), jnp.int32)
    a = dr_mod.apply_noise(spec, jax.random.PRNGKey(2), corr, x, gs)
    b = dr_mod.apply_noise(spec, jax.random.PRNGKey(3), corr, x, gs)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_linear_schedule_scales_noise():
    spec = NoiseSpec(range=(0.0, 1.0), schedule="linear", schedule_steps=100)
    corr = jnp.zeros((4, 3))
    x = jnp.zeros((4, 3))
    early = dr_mod.apply_noise(spec, jax.random.PRNGKey(0), corr, x,
                               jnp.asarray(0, jnp.int32))
    late = dr_mod.apply_noise(spec, jax.random.PRNGKey(0), corr, x,
                              jnp.asarray(50, jnp.int32))
    full = dr_mod.apply_noise(spec, jax.random.PRNGKey(0), corr, x,
                              jnp.asarray(100, jnp.int32))
    assert np.allclose(np.asarray(early), 0.0)
    # same key → same standard draw, scaled by the schedule
    assert np.allclose(np.asarray(late) * 2.0, np.asarray(full), atol=1e-6)


def test_constant_schedule_gates_noise():
    spec = NoiseSpec(range=(0.0, 1.0), schedule="constant", schedule_steps=100)
    corr = jnp.zeros((4, 3))
    x = jnp.zeros((4, 3))
    off = dr_mod.apply_noise(spec, jax.random.PRNGKey(0), corr, x,
                             jnp.asarray(99, jnp.int32))
    on = dr_mod.apply_noise(spec, jax.random.PRNGKey(0), corr, x,
                            jnp.asarray(100, jnp.int32))
    assert np.allclose(np.asarray(off), 0.0)
    assert float(jnp.abs(on).max()) > 0.0


def test_scaling_operation_identity_at_step0():
    spec = NoiseSpec(range=(1.0, 0.3), operation="scaling", distribution="gaussian",
                     schedule="linear", schedule_steps=100)
    corr = jnp.zeros((4, 3))
    x = jnp.ones((4, 3)) * 2.0
    out = dr_mod.apply_noise(spec, jax.random.PRNGKey(0), corr, x,
                             jnp.asarray(0, jnp.int32))
    # at step 0 a scaling op multiplies by exactly 1
    assert np.allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_gravity_dr_skipped_when_disabled(small_env):
    cfg, model, subs, state, step = small_env
    # ADVICE r2: the reference plug actor has disable_gravity=True
    # (factory_env_insertion.py:665), so sim-param gravity DR never reaches
    # it — with the default disable_gravity config the per-env gravity must
    # stay exactly 0 (no random constant acceleration)
    g = np.asarray(state.params.gravity)
    assert np.allclose(g, 0.0)


def test_gravity_dr_varies_per_env():
    # with gravity enabled, the vec_task.py:736-748 additive gaussian DR
    # produces per-env spread about the base gravity
    cfg = default_task_config()
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, substeps=1, solver_iters=2, disable_gravity=False))
    model = build_kuka_openhand()
    subs = build_subassembly_set(names=("yellow_round_peg_2in",))
    state = ins.reset_all(cfg, model, subs, jax.random.PRNGKey(0), 4)
    g = np.asarray(state.params.gravity)
    assert g.std() > 0.0
    assert abs(g.mean() - cfg.sim.gravity) < 2.0


# --------------------------------------------------------------------------- #
# plug/socket scale
# --------------------------------------------------------------------------- #

def test_plug_scale_from_asset_yaml():
    subs = build_subassembly_set()
    for i, name in enumerate(subs.names):
        assert subs.plug_scale[i] == pytest.approx(SUBASSEMBLIES[name].plug_scale)
    assert SUBASSEMBLIES["yellow_round_peg_2in"].plug_scale == pytest.approx(1.04)


def test_priv_state_reports_true_scales(small_env):
    cfg, model, subs, state, step = small_env
    priv = np.asarray(ins.priv_info_of(cfg, model, state))
    # layout: last two physics-param columns are plug_scale, socket_scale
    plug_scale_col = priv[:, -2]
    socket_scale_col = priv[:, -1]
    assert np.allclose(plug_scale_col, 1.04, atol=1e-5)
    lo, hi = cfg.randomize.socket_scale
    assert np.all(socket_scale_col >= lo - 1e-6)
    assert np.all(socket_scale_col <= hi + 1e-6)
    assert socket_scale_col.std() > 0.0


def test_socket_scale_folded_into_hole_dims(small_env):
    cfg, model, subs, state, step = small_env
    base_hx = subs.hole_hx[np.asarray(state.sub_idx)]
    assert np.allclose(
        np.asarray(state.params.hole_hx),
        base_hx * np.asarray(state.params.socket_scale), atol=1e-6)


def test_clearance_curriculum_anneals_hole_scale():
    """RandomizeConfig.clearance_curriculum_*: hole dims start (1+extra)x
    looser at global_step 0 and reach the true distribution at the schedule
    end (same _sample_episode key => same base socket-scale draw)."""
    model = build_kuka_openhand()
    subs = build_subassembly_set(names=("yellow_round_peg_2in",))
    base = default_task_config()
    cfg = base.replace(randomize=dataclasses.replace(
        base.randomize, clearance_curriculum_extra=0.2,
        clearance_curriculum_steps=1000.0))
    from isaacgyminsertion_tpu.physics import engine
    sub_idx = jnp.zeros((4,), jnp.int32)
    base_params = engine.make_params(subs, sub_idx, 4)

    def hole_hx(c, gs):
        _, params, _ = ins._sample_episode(
            c, model, subs, jax.random.PRNGKey(3), 4, sub_idx, base_params,
            global_step=jnp.asarray(gs, jnp.int32))
        return np.asarray(params.hole_hx)

    h0 = hole_hx(cfg, 0)
    h_half = hole_hx(cfg, 500)
    h_end = hole_hx(cfg, 1000)
    h_off = hole_hx(base, 0)
    np.testing.assert_allclose(h0, h_off * 1.2, rtol=1e-5)
    np.testing.assert_allclose(h_half, h_off * 1.1, rtol=1e-5)
    np.testing.assert_allclose(h_end, h_off, rtol=1e-5)
