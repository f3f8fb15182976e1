"""Privileged extrinsic-contact ground truth (pure JAX).

Replaces ExtrinsicContact's Open3D RaycastingScene unsigned-distance queries
(factory_env_insertion.py:246-306) with the analytic socket SDF: transform the
plug's dense surface sample points by the plug pose, evaluate |SDF| in the
socket frame, then apply the reference's exact post-processing:

  d = clip(dist, 0, threshold); d = 1 − d/threshold; d[d > 0.1] = 1
  then randomly zero a uniform(0, 0.1) fraction of the active contacts
  (stochastic dropout DR on the privileged signal).

Output: [N, P] contact vector in [0, 1] (P = num contact points, task cfg
env.num_points = 400).

Runs in coordinate-plane (SoA) layout: an [N, P, 3] point array pads its
minor axis 3 → 128 TPU lanes (~42× the bytes/VPU work), so the pose
transforms are 9 scalar-broadcast madds on [N, P] planes and the SDF is the
plane-form family (ops/sdf.py); the output is [N, P] already, so no AoS
assembly is needed at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets import SOCKET_PLATE_HX, SOCKET_PLATE_HY
from ..ops import rotations as rot
from ..ops import sdf as sdfm


def extrinsic_contact(
    dense_points: jax.Array,   # [N, P, 3] plug-frame surface samples
    plug_q: jax.Array,         # [N, 4]
    plug_pos: jax.Array,       # [N, 3]
    socket_q: jax.Array,
    socket_pos: jax.Array,
    kind_onehot: jax.Array,
    hole_hx: jax.Array,
    hole_hy: jax.Array,
    socket_height: jax.Array,
    key: jax.Array,
    threshold: float = 0.002,
) -> jax.Array:
    lx, ly, lz = dense_points[..., 0], dense_points[..., 1], dense_points[..., 2]
    Rp = rot.quat_to_matrix(plug_q)
    Rs = rot.quat_to_matrix(socket_q)
    rp = lambda i, j: Rp[..., i, j][..., None]
    rs = lambda i, j: Rs[..., i, j][..., None]
    col = lambda v, i: v[..., i][..., None]

    wx = rp(0, 0) * lx + rp(0, 1) * ly + rp(0, 2) * lz + col(plug_pos, 0)
    wy = rp(1, 0) * lx + rp(1, 1) * ly + rp(1, 2) * lz + col(plug_pos, 1)
    wz = rp(2, 0) * lx + rp(2, 1) * ly + rp(2, 2) * lz + col(plug_pos, 2)
    dxw = wx - col(socket_pos, 0)
    dyw = wy - col(socket_pos, 1)
    dzw = wz - col(socket_pos, 2)
    # socket frame: p_s = Rsᵀ (w − t_s)
    sx = rs(0, 0) * dxw + rs(1, 0) * dyw + rs(2, 0) * dzw
    sy = rs(0, 1) * dxw + rs(1, 1) * dyw + rs(2, 1) * dzw
    sz = rs(0, 2) * dxw + rs(1, 2) * dyw + rs(2, 2) * dzw

    oh = tuple(kind_onehot[..., k][..., None] for k in range(kind_onehot.shape[-1]))
    dist = jnp.abs(
        sdfm.socket_sdf_planes(
            sx, sy, sz, oh, hole_hx[:, None], hole_hy[:, None],
            socket_height[:, None], float(SOCKET_PLATE_HX), float(SOCKET_PLATE_HY),
        )
    )
    d = 1.0 - jnp.clip(dist, 0.0, threshold) / threshold
    d = jnp.where(d > 0.1, 1.0, d)

    # random dropout of a uniform(0, 0.1) fraction of active contacts
    k1, k2 = jax.random.split(key)
    frac = jax.random.uniform(k1, (d.shape[0], 1), maxval=0.1)
    drop = jax.random.uniform(k2, d.shape) < frac
    return jnp.where((d == 1.0) & drop, 0.0, d)
