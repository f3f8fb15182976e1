"""Batched rotation / rigid-transform math (pure JAX).

Quaternions are **xyzw** (IsaacGym convention). All functions broadcast over
arbitrary leading batch dims and are safe under jit/vmap/grad.

Capability parity with the reference's torch math stack:
  - isaacgyminsertion/utils/torch_jit_utils.py (quat_mul/apply/conjugate,
    tf_combine/tf_inverse, quat_from_euler_xyz, get_euler_xyz, ...)
  - tasks/factory_tactile/factory_control.py:441-501 (axis-angle conversions,
    random quats)
  - algo/models/transformer/utils.py RotationTransformer (rot6d).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------- basics


def quat_unit(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit length."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_identity_like(x: jax.Array) -> jax.Array:
    """Identity quaternion broadcast to x's leading dims ([..., 4])."""
    q = jnp.zeros(x.shape[:-1] + (4,), x.dtype)
    return q.at[..., 3].set(1.0)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


# Structure tensors: quaternion algebra as bilinear einsums. Slice-and-stack
# formulations chain into exponentially-duplicating XLA fusions (a deep
# quat_mul chain compiled AND ran thousands of times slower on XLA:CPU);
# einsum contractions keep each product one dot-general and map onto the MXU
# for large batches.


def _quat_mul_tensor() -> jnp.ndarray:
    """M[i,j,k] with (a⊗b)_k = a_i b_j M[i,j,k] (xyzw Hamilton product)."""
    import numpy as np

    M = np.zeros((4, 4, 4), np.float32)
    x, y, z, w = 0, 1, 2, 3
    for i, j, k, s in [
        (w, x, x, 1), (x, w, x, 1), (y, z, x, 1), (z, y, x, -1),
        (w, y, y, 1), (x, z, y, -1), (y, w, y, 1), (z, x, y, 1),
        (w, z, z, 1), (x, y, z, 1), (y, x, z, -1), (z, w, z, 1),
        (w, w, w, 1), (x, x, w, -1), (y, y, w, -1), (z, z, w, -1),
    ]:
        M[i, j, k] += s
    return jnp.asarray(M)


_QMUL = _quat_mul_tensor()


def _quat_rot_tensor() -> jnp.ndarray:
    """T[i,j,l,k] with (R(q) v)_k = q_i q_j v_l T[i,j,l,k] for unit q."""
    import numpy as np

    T = np.zeros((4, 4, 3, 3), np.float32)
    x, y, z, w = 0, 1, 2, 3
    # R = (w^2 - s.s) I + 2 s s^T + 2 w [s]_x   (s = xyz)
    for l in range(3):
        T[w, w, l, l] += 1.0
        for s_ in (x, y, z):
            T[s_, s_, l, l] -= 1.0
    for a in range(3):
        for b in range(3):
            T[a, b, b, a] += 2.0
    # 2 w (s × v)_k = 2 w ε_{kal} s_a v_l ; qq is symmetrized so split w–s
    # weight evenly over T[w,a] and T[a,w]
    eps3 = np.zeros((3, 3, 3))
    eps3[0, 1, 2] = eps3[1, 2, 0] = eps3[2, 0, 1] = 1.0
    eps3[0, 2, 1] = eps3[2, 1, 0] = eps3[1, 0, 2] = -1.0
    for k in range(3):
        for a in range(3):
            for l in range(3):
                T[w, a, l, k] += 1.0 * eps3[k, a, l]
                T[a, w, l, k] += 1.0 * eps3[k, a, l]
    return jnp.asarray(T)


_QROT = _quat_rot_tensor()


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, xyzw layout (bilinear einsum)."""
    a, b = jnp.broadcast_arrays(a, b)
    return jnp.einsum("...i,...j,ijk->...k", a, b, _QMUL.astype(a.dtype))


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q (quadratic-form einsum)."""
    batch = jnp.broadcast_shapes(q.shape[:-1], v.shape[:-1])
    qb = jnp.broadcast_to(q, batch + (4,))
    vb = jnp.broadcast_to(v, batch + (3,))
    qq = qb[..., :, None] * qb[..., None, :]  # [..., 4, 4]
    return jnp.einsum("...ij,...l,ijlk->...k", qq, vb, _QROT.astype(v.dtype))


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_apply(quat_conjugate(q), v)


# ------------------------------------------------------------------- constructions


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Quaternion from rotation angle(s) about unit axis(es)."""
    half = 0.5 * angle[..., None]
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True).clip(1e-9)
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_from_rotvec(rotvec: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Quaternion from a rotation vector (axis * angle); stable near zero."""
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(a/2)/a -> 1/2 - a^2/48 as a->0
    small = angle < eps
    sinc_half = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate([rotvec * sinc_half, jnp.cos(half)], axis=-1)


def axis_angle_from_quat(q: jax.Array, eps: float = 1.0e-6) -> jax.Array:
    """Rotation vector (axis*angle) from quaternion.

    Parity: factory_control.py:451-463 (pytorch3d-style stable form).
    """
    mag = jnp.linalg.norm(q[..., :3], axis=-1)
    half_angle = jnp.arctan2(mag, q[..., 3])
    angle = 2.0 * half_angle
    sin_half_over_angle = jnp.where(
        jnp.abs(angle) > eps, jnp.sin(half_angle) / jnp.where(jnp.abs(angle) > eps, angle, 1.0),
        0.5 - angle * angle / 48.0,
    )
    return q[..., :3] / sin_half_over_angle[..., None]


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler -> quaternion (matches IsaacGym's quat_from_euler_xyz)."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def get_euler_xyz(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quaternion -> (roll, pitch, yaw); each in [0, 2pi) like IsaacGym's version."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(jnp.abs(sinp) >= 1.0, jnp.copysign(jnp.pi / 2.0, sinp), jnp.arcsin(sinp.clip(-1.0, 1.0)))
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    two_pi = 2.0 * jnp.pi
    return roll % two_pi, pitch % two_pi, yaw % two_pi


def euler_xyz_signed(q: jax.Array) -> jax.Array:
    """Quaternion -> [..., 3] euler xyz wrapped to (-pi, pi].

    Parity with the degrasp check (factory_task_insertion.py:1196-1201) which
    wraps get_euler_xyz outputs above pi back by 2pi.
    """
    r, p, y = get_euler_xyz(q)
    e = jnp.stack([r, p, y], axis=-1)
    return jnp.where(e > jnp.pi, e - 2.0 * jnp.pi, e)


# ---------------------------------------------------------------------- matrices


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion xyzw (branch-free, stable)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # four candidate solutions, pick the numerically largest pivot
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw_w = safe_sqrt(tw) / 2.0
    q_w = jnp.stack([(m21 - m12) / (4 * qw_w), (m02 - m20) / (4 * qw_w), (m10 - m01) / (4 * qw_w), qw_w], axis=-1)
    qx_x = safe_sqrt(tx) / 2.0
    q_x = jnp.stack([qx_x, (m01 + m10) / (4 * qx_x), (m02 + m20) / (4 * qx_x), (m21 - m12) / (4 * qx_x)], axis=-1)
    qy_y = safe_sqrt(ty) / 2.0
    q_y = jnp.stack([(m01 + m10) / (4 * qy_y), qy_y, (m12 + m21) / (4 * qy_y), (m02 - m20) / (4 * qy_y)], axis=-1)
    qz_z = safe_sqrt(tz) / 2.0
    q_z = jnp.stack([(m02 + m20) / (4 * qz_z), (m12 + m21) / (4 * qz_z), qz_z, (m10 - m01) / (4 * qz_z)], axis=-1)

    t = jnp.stack([tx, ty, tz, tw], axis=-1)
    idx = jnp.argmax(t, axis=-1)
    cands = jnp.stack([q_x, q_y, q_z, q_w], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2).squeeze(-2)
    return quat_unit(q)


def quat_to_rot6d(q: jax.Array) -> jax.Array:
    """Quaternion -> 6d rotation rep (first two rows of R, row-major).

    Parity: RotationTransformer('quaternion','rotation_6d') used for the 15-dim
    teacher obs (factory_base.py:633-649).
    """
    m = quat_to_matrix(q)
    return m[..., :2, :].reshape(q.shape[:-1] + (6,))


def rot6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6d rep -> rotation matrix via Gram-Schmidt (Zhou et al. 2019)."""
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-9)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(1e-9)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def rot6d_to_quat(d6: jax.Array) -> jax.Array:
    return matrix_to_quat(rot6d_to_matrix(d6))


# --------------------------------------------------------------------- transforms


def tf_inverse(q: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of rigid transform (q, t)."""
    q_inv = quat_conjugate(q)
    return q_inv, -quat_apply(q_inv, t)


def tf_apply(q: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
    """Apply transform to point(s)."""
    return quat_apply(q, v) + t


def tf_combine(q1: jax.Array, t1: jax.Array, q2: jax.Array, t2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Compose transforms: (q1,t1) ∘ (q2,t2)."""
    return quat_mul(q1, q2), quat_apply(q1, t2) + t1


def translate_along_local_z(pos: jax.Array, quat: jax.Array, offset: jax.Array) -> jax.Array:
    """Translate global position along body-local z (factory_control.py:427-438)."""
    z = jnp.zeros_like(pos).at[..., 2].set(1.0)
    off = jnp.asarray(offset)
    if off.ndim and off.shape[-1:] == (1,):
        off = off[..., 0]
    return pos + quat_apply(quat, z * off[..., None] if off.ndim < pos.ndim else z * off)


def quat_diff_rad(a: jax.Array, b: jax.Array) -> jax.Array:
    """Rotation angle between two quaternions (the reference's rot_dist:
    2*asin(clamp(|vec(q_a q_b^-1)|, max=1))."""
    d = quat_mul(a, quat_conjugate(b))
    return 2.0 * jnp.arcsin(jnp.linalg.norm(d[..., :3], axis=-1).clip(max=1.0))


# ------------------------------------------------------------------------ random


def random_quat(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random quaternions (Shoemake; parity factory_control.py:479-490)."""
    u = jax.random.uniform(key, shape + (3,))
    u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
    tau = 2.0 * math.pi
    return jnp.stack(
        [
            jnp.sqrt(1 - u0) * jnp.sin(tau * u1),
            jnp.sqrt(1 - u0) * jnp.cos(tau * u1),
            jnp.sqrt(u0) * jnp.sin(tau * u2),
            jnp.sqrt(u0) * jnp.cos(tau * u2),
        ],
        axis=-1,
    )
