"""Golden-value tests for ops.rotations vs scipy.spatial.transform."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from isaacgyminsertion_tpu.ops import rotations as rot


@pytest.fixture(scope="module")
def quats():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy(quats):
    a, b = quats[:32], quats[32:]
    got = np.asarray(rot.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (R.from_quat(a) * R.from_quat(b)).as_quat()
    # sign ambiguity
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_apply_matches_scipy(quats):
    rng = np.random.default_rng(1)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(rot.quat_apply(jnp.asarray(quats), jnp.asarray(v)))
    want = R.from_quat(quats).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_matrix_roundtrip(quats):
    m = rot.quat_to_matrix(jnp.asarray(quats))
    np.testing.assert_allclose(np.asarray(m), R.from_quat(quats).as_matrix(), atol=1e-5)
    q2 = np.asarray(rot.matrix_to_quat(m))
    sign = np.sign(np.sum(q2 * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, quats, atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.default_rng(2)
    e = rng.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
    q = rot.quat_from_euler_xyz(jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1]), jnp.asarray(e[:, 2]))
    want = R.from_euler("xyz", e).as_quat()
    got = np.asarray(q)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)
    e2 = np.asarray(rot.euler_xyz_signed(q))
    np.testing.assert_allclose(e2, e, atol=1e-4)


def test_axis_angle_roundtrip(quats):
    aa = rot.axis_angle_from_quat(jnp.asarray(quats))
    want = R.from_quat(quats).as_rotvec()
    got = np.asarray(aa)
    # rotvec of q and -q differ; compare rotations instead
    back = R.from_rotvec(got)
    ang = (back.inv() * R.from_quat(quats)).magnitude()
    assert np.max(ang) < 1e-4
    q2 = rot.quat_from_rotvec(jnp.asarray(want.astype(np.float32)))
    sign = np.sign(np.sum(np.asarray(q2) * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2) * sign, quats, atol=1e-5)


def test_rot6d_roundtrip(quats):
    d6 = rot.quat_to_rot6d(jnp.asarray(quats))
    m = rot.rot6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m), R.from_quat(quats).as_matrix(), atol=1e-5)


def test_tf_combine_inverse(quats):
    rng = np.random.default_rng(3)
    t = rng.normal(size=(64, 3)).astype(np.float32)
    q = jnp.asarray(quats)
    tj = jnp.asarray(t)
    qi, ti = rot.tf_inverse(q, tj)
    qc, tc = rot.tf_combine(qi, ti, q, tj)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(qc)[:, 3]), 1.0, atol=1e-5)


def test_quat_diff_rad():
    a = rot.quat_from_angle_axis(jnp.asarray([0.3]), jnp.asarray([[0.0, 0.0, 1.0]]))
    b = rot.quat_from_angle_axis(jnp.asarray([0.5]), jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(float(rot.quat_diff_rad(a, b)[0]), 0.2, atol=1e-5)


def test_random_quat_uniform_norm():
    q = rot.random_quat(jax.random.PRNGKey(0), (128,))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
