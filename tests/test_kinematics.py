"""FK / Jacobian / dynamics tests: finite differences + analytic pendulum."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from isaacgyminsertion_tpu.physics import dynamics, kinematics, robot
from isaacgyminsertion_tpu.physics.robot import RobotModel


@pytest.fixture(scope="module")
def model():
    return robot.build_kuka_openhand()


def scipy_fk_chain(model, q):
    """Independent numpy FK for cross-checking."""
    nd = len(model.parent)
    Rs, ts = [], []
    for i in range(nd):
        p = model.parent[i]
        Rp = Rs[p] if p >= 0 else np.eye(3)
        tp = ts[p] if p >= 0 else np.zeros(3)
        Rj = R.from_quat(model.joint_q[i]).as_matrix()
        Rq = R.from_rotvec(model.axis[i] * q[i]).as_matrix()
        Rs.append(Rp @ Rj @ Rq)
        ts.append(tp + Rp @ model.joint_t[i])
    return Rs, ts


def test_fk_matches_numpy(model):
    rng = np.random.default_rng(0)
    q = rng.uniform(-1.0, 1.0, size=15).astype(np.float32)
    fk = kinematics.forward_kinematics(model, jnp.asarray(q))
    Rs, ts = scipy_fk_chain(model, q)
    for i in range(15):
        np.testing.assert_allclose(np.asarray(fk.body_t[i]), ts[i], atol=1e-5)
        got = R.from_quat(np.asarray(fk.body_q[i])).as_matrix()
        np.testing.assert_allclose(got, Rs[i], atol=1e-5)


def test_fk_batched(model):
    q = jnp.zeros((4, 15))
    fk = kinematics.forward_kinematics(model, q)
    assert fk.body_t.shape == (4, 15, 3)


def test_fingertip_centered_site_reasonable(model):
    """At the reference's initial arm pose the EEF should be in front of the
    robot (x>0.3), above the table, pointing down-ish."""
    q0 = jnp.zeros(15).at[:7].set(
        jnp.asarray([0.0064, 0.2375, -0.0075, -1.2022, 0.0015, 1.69, -1.5699])
    )
    fk = kinematics.forward_kinematics(model, q0)
    sq, st = kinematics.site_pose(model, fk, robot.SITE_FINGERTIP_CENTERED)
    st = np.asarray(st)
    assert st[0] > 0.25 and 0.0 < st[2] < 1.0, st


def test_point_jacobian_fd(model):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-0.8, 0.8, size=15).astype(np.float32))
    body = 6  # link7

    def site_pos(qq):
        fk = kinematics.forward_kinematics(model, qq)
        _, st = kinematics.site_pose(model, fk, robot.SITE_FINGERTIP_CENTERED)
        return st

    fk = kinematics.forward_kinematics(model, q)
    p = site_pos(q)
    J = kinematics.point_jacobian(model, fk, p, body)
    J_fd = jax.jacfwd(site_pos)(q)
    np.testing.assert_allclose(np.asarray(J[:3]), np.asarray(J_fd), atol=1e-4)


def test_mass_matrix_spd(model):
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-0.8, 0.8, size=(3, 15)).astype(np.float32))
    M = dynamics.mass_matrix(model, q)
    Mn = np.asarray(M)
    np.testing.assert_allclose(Mn, np.swapaxes(Mn, -1, -2), atol=1e-5)
    for i in range(3):
        w = np.linalg.eigvalsh(Mn[i])
        assert w.min() > 0, w.min()


def test_kinetic_energy_consistency(model):
    """0.5 qd' M qd equals the sum of body kinetic energies."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-0.8, 0.8, size=15).astype(np.float32))
    qd = jnp.asarray(rng.uniform(-1, 1, size=15).astype(np.float32))
    M = dynamics.mass_matrix(model, q) - jnp.diag(jnp.asarray(model.armature))
    ke_m = 0.5 * float(qd @ M @ qd)
    v = kinematics.body_velocities(model, q, qd)
    fk = kinematics.forward_kinematics(model, q)
    Iw = dynamics._world_inertia(model, fk)
    vlin, w = v[..., :3], v[..., 3:]
    ke_b = 0.5 * float(
        jnp.sum(jnp.asarray(model.mass) * jnp.sum(vlin * vlin, -1))
        + jnp.sum(w * jnp.einsum("bij,bj->bi", Iw, w))
    )
    np.testing.assert_allclose(ke_m, ke_b, rtol=1e-5)


def _pendulum_model():
    """Single revolute joint about world x at origin; point mass m at [0,0,-l]."""
    m, l = 2.0, 0.5
    nd = 1
    return RobotModel(
        parent=np.array([-1], np.int32),
        joint_t=np.zeros((1, 3), np.float32),
        joint_q=np.array([[0, 0, 0, 1]], np.float32),
        axis=np.array([[1, 0, 0]], np.float32),
        mass=np.array([m], np.float32),
        com=np.array([[0, 0, -l]], np.float32),
        inertia=np.zeros((1, 3, 3), np.float32),
        armature=np.zeros(1, np.float32),
        damping=np.zeros(1, np.float32),
        dof_lower=np.full(1, -10.0, np.float32),
        dof_upper=np.full(1, 10.0, np.float32),
        effort_limit=np.full(1, 1e6, np.float32),
        velocity_limit=np.full(1, 1e6, np.float32),
        ancestor_mask=np.ones((1, 1), np.float32),
        site_body=np.array([0], np.int32),
        site_t=np.zeros((1, 3), np.float32),
        site_q=np.array([[0, 0, 0, 1]], np.float32),
    ), m, l


def test_pendulum_mass_and_gravity():
    pend, m, l = _pendulum_model()
    q = jnp.asarray([0.3])
    M = dynamics.mass_matrix(pend, q)
    np.testing.assert_allclose(float(M[0, 0]), m * l * l, rtol=1e-5)
    # static bias at angle th: C = -J^T m g => torque needed to hold = m g l sin(th)
    C = dynamics.bias_forces(pend, q, jnp.zeros(1), gravity=-9.81)
    np.testing.assert_allclose(float(C[0]), m * 9.81 * l * np.sin(0.3), rtol=1e-4)


def test_pendulum_energy_conservation():
    pend, m, l = _pendulum_model()
    g = -9.81
    h = 1e-3
    q, qd = jnp.asarray([1.2]), jnp.asarray([0.0])

    def energy(q, qd):
        ke = 0.5 * m * (l * float(qd[0])) ** 2
        pe = m * 9.81 * (-l * np.cos(float(q[0])))
        return ke + pe

    e0 = energy(q, qd)

    def step(carry, _):
        q, qd = carry
        fk = kinematics.forward_kinematics(pend, q)
        M = dynamics.mass_matrix(pend, q, fk=fk)
        C = dynamics.bias_forces(pend, q, qd, gravity=g, fk=fk)
        q, qd, _ = dynamics.implicit_pd_step(
            pend, q, qd, q, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1), h, M, C
        )
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=2000)
    e1 = energy(q, qd)
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05, (e0, e1)


def test_coriolis_antisymmetry(model):
    """Power balance: qd^T (Mdot - 2C_mat) qd = 0 <=> d(KE)/dt = qd^T tau with
    tau = M qdd + C. Verified numerically via a short passive rollout."""
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, size=15).astype(np.float32))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, size=15).astype(np.float32))
    # with zero external torque and no gravity, dKE/dt must be ~0:
    # qdd = -M^{-1} C; dKE/dt = qd^T M qdd + 0.5 qd^T Mdot qd = qd^T(-C) + qd^T C = 0
    M = dynamics.mass_matrix(model, q) - jnp.diag(jnp.asarray(model.armature))
    C = dynamics.bias_forces(model, q, qd, gravity=0.0)

    def ke(qq, qqd):
        Mm = dynamics.mass_matrix(model, qq) - jnp.diag(jnp.asarray(model.armature))
        return 0.5 * qqd @ Mm @ qqd

    qdd = -jnp.linalg.solve(M, C)
    dke = jax.jvp(ke, (q, qd), (qd, qdd))[1]
    assert abs(float(dke)) < 1e-3, float(dke)


def test_pointer_jumping_fk_matches_serial(model):
    """forward_kinematics (pointer-jumping parallel prefix) ≡ the serial
    chain-walk oracle on random configurations."""
    from isaacgyminsertion_tpu.physics.kinematics import (
        forward_kinematics,
        forward_kinematics_jump,
    )

    q = jnp.asarray(np.random.default_rng(3).uniform(-2.0, 2.0, (32, 15)),
                    jnp.float32)
    a = forward_kinematics_jump(model, q)
    b = forward_kinematics(model, q)
    for name in a._fields:
        assert float(jnp.max(jnp.abs(getattr(a, name) - getattr(b, name)))) < 1e-5
