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
    p_w = plug_pos[:, None, :] + rot.quat_apply(plug_q[:, None, :], dense_points)
    inv_q, inv_t = rot.tf_inverse(socket_q, socket_pos)
    p_s = inv_t[:, None, :] + rot.quat_apply(inv_q[:, None, :], p_w)
    dist = jnp.abs(
        sdfm.socket_sdf(
            p_s, kind_onehot[:, None, :], hole_hx[:, None], hole_hy[:, None],
            socket_height[:, None],
            jnp.asarray(SOCKET_PLATE_HX, p_s.dtype), jnp.asarray(SOCKET_PLATE_HY, p_s.dtype),
        )
    )
    d = 1.0 - jnp.clip(dist, 0.0, threshold) / threshold
    d = jnp.where(d > 0.1, 1.0, d)

    # random dropout of a uniform(0, 0.1) fraction of active contacts
    k1, k2 = jax.random.split(key)
    frac = jax.random.uniform(k1, (d.shape[0], 1), maxval=0.1)
    drop = jax.random.uniform(k2, d.shape) < frac
    return jnp.where((d == 1.0) & drop, 0.0, d)
