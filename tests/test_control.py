"""Controller-mode tests: IK methods, torque modes, env integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.ops import control as ctrlmod
from isaacgyminsertion_tpu.physics.kinematics import forward_kinematics, point_jacobian, site_pose
from isaacgyminsertion_tpu.physics.robot import SITE_FINGERTIP_CENTERED, build_kuka_openhand

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()


@pytest.mark.parametrize("ik", ["pinv", "trans", "dls", "svd"])
def test_ik_methods_reduce_pose_error(ik):
    q = insertion.reset_all(default_task_config(), MODEL, SUBS,
                            jax.random.PRNGKey(0), 2).phys.q
    fk = forward_kinematics(MODEL, q)
    fq, ft = site_pose(MODEL, fk, SITE_FINGERTIP_CENTERED)
    target = ft + jnp.asarray([0.02, -0.01, 0.015])
    J = point_jacobian(MODEL, fk, ft, 6)[..., :7]
    err = jnp.concatenate([target - ft, jnp.zeros((2, 3))], -1)
    dq = ctrlmod._get_delta_dof_pos(err, J, ik)
    q2 = q.at[:, :7].add(dq)
    fk2 = forward_kinematics(MODEL, q2)
    _, ft2 = site_pose(MODEL, fk2, SITE_FINGERTIP_CENTERED)
    assert float(jnp.linalg.norm(target - ft2)) < float(jnp.linalg.norm(target - ft))


@pytest.mark.parametrize("mode", [
    "joint_space_id", "task_space_impedance", "operational_space_motion",
    "open_loop_force", "closed_loop_force", "hybrid_force_motion",
])
def test_torque_modes_produce_bounded_torques(mode):
    n = 2
    state = insertion.reset_all(default_task_config(), MODEL, SUBS,
                                jax.random.PRNGKey(1), n)
    q, qd = state.phys.q, state.phys.qd
    fk = forward_kinematics(MODEL, q)
    fq, ft = site_pose(MODEL, fk, SITE_FINGERTIP_CENTERED)
    J = point_jacobian(MODEL, fk, ft, 6)[..., :7]
    from isaacgyminsertion_tpu.physics.dynamics import mass_matrix

    M = mass_matrix(MODEL, q)[:, :7, :7]
    tau = ctrlmod.compute_dof_torque(
        ctrlmod.DEFAULT_CTRL_CFGS[mode], q, qd, ft, fq,
        jnp.zeros((n, 3)), jnp.zeros((n, 3)),
        jnp.zeros((n, 3)), jnp.zeros((n, 3)), J, M,
        q[:, 7:], ft + 0.01, fq, jnp.ones((n, 6)),
    )
    assert tau.shape == (n, 15)
    assert bool(jnp.all(jnp.isfinite(tau)))
    assert float(jnp.max(jnp.abs(tau))) <= ctrlmod.TORQUE_CLAMP + 1e-5


def test_env_runs_with_task_space_impedance():
    cfg = default_task_config().replace(ctrl_type="task_space_impedance")
    state = insertion.reset_all(cfg, MODEL, SUBS, jax.random.PRNGKey(2), 4)
    step = jax.jit(lambda s, a: insertion.step(cfg, MODEL, SUBS, s, a))
    for _ in range(5):
        state, out = step(state, jnp.zeros((4, 6)))
    for leaf in jax.tree_util.tree_leaves(state):
        assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))
    # arm stays in a sane configuration under torque control
    assert float(jnp.max(jnp.abs(state.phys.qd[:, :7]))) < 5.0


def test_chol_solve_small_matches_linalg():
    """ops/linalg.chol_solve_small vs jnp.linalg.solve on random SPD batches."""
    import jax.numpy as jnp
    import numpy as np

    from isaacgyminsertion_tpu.ops.linalg import chol_solve_small

    rng = np.random.default_rng(0)
    for d in (3, 6, 15):
        B = rng.normal(size=(64, d, d)).astype(np.float32)
        lhs = B @ np.swapaxes(B, -1, -2) + d * np.eye(d, dtype=np.float32)
        rhs = rng.normal(size=(64, d)).astype(np.float32)
        x = chol_solve_small(jnp.asarray(lhs), jnp.asarray(rhs))
        x_ref = jnp.linalg.solve(jnp.asarray(lhs), jnp.asarray(rhs)[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-4)
    # multi-dim batch shape
    lhs1 = jnp.asarray(lhs).reshape(8, 8, 15, 15)
    rhs1 = jnp.asarray(rhs).reshape(8, 8, 15)
    x = chol_solve_small(lhs1, rhs1)
    assert x.shape == (8, 8, 15)
