"""Grasp-dataset generation/resets + sys-id TPE tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.envs.grasp_gen import generate_grasp_dataset, load_grasp_data
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.sysid import Uniform, make_replay_objective, tpe_minimize

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()
CFG = default_task_config()


def test_grasp_dataset_roundtrip_and_reset(tmp_path):
    path = str(tmp_path / "grasps.npz")
    n = generate_grasp_dataset(CFG, MODEL, SUBS, n_envs=8, n_rounds=2, out_path=path,
                               settle_steps=5)
    assert n > 0
    gd = load_grasp_data(path, n_sub=len(SUBS.names), model=MODEL)
    # Euler-outlier filter may prune tilted rows (factory_env_insertion.py:
    # 541-607) but settled grasps are near-upright, so most survive
    assert 0 < int(gd.count.sum()) <= n

    # the world-frame Euler-outlier filter drops a synthetically tilted row
    with np.load(path) as d:
        raw = {k: d[k] for k in d.files}
    tilted = {k: v[-1:].copy() for k, v in raw.items()}
    tilted["plug_quat_hand"][:] = np.asarray([np.sin(0.45), 0, 0, np.cos(0.45)])
    bad = {k: np.concatenate([raw[k], tilted[k]]) for k in raw}
    bad_path = str(tmp_path / "grasps_bad.npz")
    np.savez_compressed(bad_path, **bad)
    gd_f = load_grasp_data(bad_path, n_sub=len(SUBS.names), model=MODEL)
    assert int(gd_f.count.sum()) == int(gd.count.sum())  # tilted row dropped

    state = insertion.reset_all(CFG, MODEL, SUBS, jax.random.PRNGKey(0), 8,
                                grasp_data=gd)
    # envs with rows get consistent dof/socket from the dataset
    has = np.asarray(gd.count)[np.asarray(state.sub_idx)] > 0
    if has.any():
        # plug must hang near the hand (dataset consistency)
        from isaacgyminsertion_tpu.physics.kinematics import forward_kinematics, site_pose
        from isaacgyminsertion_tpu.physics.robot import SITE_FINGERTIP_CENTERED

        fk = forward_kinematics(MODEL, state.phys.q)
        _, ftc = site_pose(MODEL, fk, SITE_FINGERTIP_CENTERED)
        d = np.linalg.norm(np.asarray(state.phys.plug_pos - ftc), axis=-1)
        assert d[has].max() < 0.15
    # stepping still works with dataset resets enabled
    step = jax.jit(lambda s, a: insertion.step(CFG, MODEL, SUBS, s, a, grasp_data=gd))
    state, out = step(state, jnp.zeros((8, 6)))
    assert bool(jnp.all(jnp.isfinite(out.rew)))


def test_tpe_minimizes_quadratic():
    space = {"x": Uniform(-2.0, 2.0), "y": Uniform(-2.0, 2.0)}
    best, hist = tpe_minimize(
        lambda p: (p["x"] - 0.7) ** 2 + (p["y"] + 0.3) ** 2, space, n_trials=60, seed=1
    )
    assert abs(best["x"] - 0.7) < 0.4 and abs(best["y"] + 0.3) < 0.4


def test_replay_objective_orders_params():
    cfg = CFG.replace(rl=dataclasses.replace(CFG.rl, max_episode_length=50))
    # record a short reference trajectory with default params
    state = insertion.reset_all(cfg, MODEL, SUBS, jax.random.PRNGKey(0), 1)
    step = jax.jit(lambda s, a: insertion.step(cfg, MODEL, SUBS, s, a))
    acts, pos, quat = [], [], []
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 6)), jnp.float32)
        state, _ = step(state, a)
        acts.append(np.asarray(a[0]))
        pos.append(np.asarray(state.phys.plug_pos[0]))
        quat.append(np.asarray(state.phys.plug_quat[0]))
    recorded = {"actions": np.stack(acts), "plug_pos": np.stack(pos),
                "plug_quat": np.stack(quat)}
    obj = make_replay_objective(cfg, MODEL, SUBS, recorded)
    nominal = obj({"mu_scale": 1.0, "kp_scale": 1.0, "kd_scale": 1.0, "mass_scale": 1.0})
    off = obj({"mu_scale": 1.0, "kp_scale": 0.3, "kd_scale": 1.0, "mass_scale": 1.0})
    assert np.isfinite(nominal) and np.isfinite(off)
    # nominal params reproduce the recording better than detuned gains
    assert nominal <= off
