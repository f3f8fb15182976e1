"""Batched contact generation against analytic SDFs (pure JAX).

Replaces PhysX SDF-mesh collision (SURVEY.md §2.9: `print_sdf_warning`,
factory_base.py:566-576). Produces kinematic contact data (point, normal,
depth, other-body velocity) for the velocity-level impulse solver
(physics/solver.py); no forces are computed here.

Contact sources, fixed shapes per env:
  - plug surface sample points (assets.sample_plug_surface) vs the socket SDF
    evaluated in the socket frame — one fused [N, P] SDF + gradient pass.
  - the same points vs the table halfspace.
  - 3 fingertip pads (spheres of AllSight gel radius) vs the plug SDF — the
    OpenHand pad is compliant gel, so a sphere-point contact is the honest
    model; reaction impulses feed back into the articulation as joint torques.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from ..ops import sdf as sdfm
from .solver import ContactSet

FINGERTIP_RADIUS = 0.0145  # AllSight gel hemisphere radius
GEL_STIFFNESS = 3500.0  # N/m — ~10 N at the 3 mm working indentation; the
                        # tactile model maps force range [0, 10] N over
                        # max_deformation 0.01 m (tacto renderer.py:560-603)


class MaterialParams(NamedTuple):
    """Per-env friction coefficients (pair-combined, PhysX average-mode)."""

    mu_socket: jax.Array   # plug↔socket
    mu_table: jax.Array    # plug↔table
    mu_finger: jax.Array   # fingertip↔plug


def default_materials(dtype=jnp.float32) -> MaterialParams:
    f = lambda v: jnp.asarray(v, dtype)
    return MaterialParams(mu_socket=f(0.5), mu_table=f(0.3), mu_finger=f(0.99))


def plug_env_contacts(
    socket_points: jax.Array,    # [N, Ps, 3] plug-frame points tested vs socket
    socket_weights: jax.Array,   # [N, Ps]
    table_points: jax.Array,     # [N, Pt, 3] plug-frame points tested vs table
    table_weights: jax.Array,    # [N, Pt]
    plug_q: jax.Array,           # [N, 4]
    plug_pos: jax.Array,         # [N, 3] plug base-origin position (world)
    plug_com_w: jax.Array,       # [N, 3]
    socket_q: jax.Array,
    socket_pos: jax.Array,
    kind_onehot: jax.Array,
    hole_hx: jax.Array,
    hole_hy: jax.Array,
    socket_height: jax.Array,
    table_height: jax.Array,
    mat: MaterialParams,
) -> ContactSet:
    """Socket-SDF + table contacts over their respective point subsets
    (assets.SOCKET_PT_COUNT / TABLE_PT_IDX split) → [N, Ps+Pt]."""
    dtype = plug_pos.dtype

    # ---- socket SDF (socket frame)
    ps_w = plug_pos[..., None, :] + rot.quat_apply(plug_q[..., None, :], socket_points)
    rs = ps_w - plug_com_w[..., None, :]
    inv_q, inv_t = rot.tf_inverse(socket_q, socket_pos)
    p_s = inv_t[..., None, :] + rot.quat_apply(inv_q[..., None, :], ps_w)

    from ..assets import SOCKET_PLATE_HX, SOCKET_PLATE_HY

    def sock_sdf(ps):
        return sdfm.socket_sdf(
            ps, kind_onehot[..., None, :], hole_hx[..., None], hole_hy[..., None],
            socket_height[..., None],
            jnp.asarray(SOCKET_PLATE_HX, dtype), jnp.asarray(SOCKET_PLATE_HY, dtype),
        )

    d_s, pullback = jax.vjp(sock_sdf, p_s)
    (grad_s,) = pullback(jnp.ones_like(d_s))
    n_local = grad_s / jnp.linalg.norm(grad_s, axis=-1, keepdims=True).clip(1e-9)
    n_s = rot.quat_apply(socket_q[..., None, :], n_local)  # pushes plug out of socket

    shape = d_s.shape
    cs_socket = ContactSet(
        r=rs, n=n_s, depth=-d_s, v_other=jnp.zeros_like(ps_w),
        mu=jnp.broadcast_to(mat.mu_socket[..., None], shape),
        weight=jnp.broadcast_to(socket_weights, shape),
        stiffness=jnp.zeros(shape, dtype),
    )

    # ---- table halfspace z >= table_height
    pt_w = plug_pos[..., None, :] + rot.quat_apply(plug_q[..., None, :], table_points)
    rt = pt_w - plug_com_w[..., None, :]
    shape_t = pt_w.shape[:-1]
    n_t = jnp.zeros_like(pt_w).at[..., 2].set(1.0)
    cs_table = ContactSet(
        r=rt, n=n_t, depth=table_height[..., None] - pt_w[..., 2],
        v_other=jnp.zeros_like(pt_w),
        mu=jnp.broadcast_to(mat.mu_table[..., None], shape_t),
        weight=jnp.broadcast_to(table_weights, shape_t),
        stiffness=jnp.zeros(shape_t, dtype),
    )
    return concat_contacts(cs_socket, cs_table)


class FingerContactAux(NamedTuple):
    contact_point: jax.Array  # [N, F, 3] world
    normal: jax.Array         # [N, F, 3] push-direction on the plug


PATCH_POINTS = 5          # center + 4-point ring per gel pad
PATCH_RING_FRAC = 0.55    # ring offset as a fraction of the pad radius


def fingertip_plug_contacts(
    tip_pos: jax.Array,       # [N, F, 3] pad centers (world)
    tip_vel: jax.Array,       # [N, F, 3]
    plug_q: jax.Array,
    plug_pos: jax.Array,
    plug_com_w: jax.Array,
    kind_onehot: jax.Array,
    plug_hx: jax.Array,
    plug_hy: jax.Array,
    plug_length: jax.Array,
    mat: MaterialParams,
    radius: float = FINGERTIP_RADIUS,
) -> tuple[ContactSet, FingerContactAux]:
    """Gel-pad vs plug-SDF PATCH contacts → [N, F*PATCH_POINTS] contact set
    (finger-major order).

    A gel pad is a ~14.5 mm hemisphere making area contact, which PhysX
    reproduces through multi-point SDF manifolds. A single point per pad
    carries zero torque resistance about the pad center, so the grasp cannot
    resist the roll/pitch slip torques that arise when the held plug meets
    the socket — measured ~50-60% of episodes ended in degrasp during
    insertion attempts, which makes risk-free hovering beat insertion under
    reset_at_fails. Each pad therefore contributes PATCH_POINTS contacts
    (center + tangent ring at PATCH_RING_FRAC·R), with the gel spring
    stiffness split per point so the net normal force at a given indentation
    is unchanged while the patch gains physical lever arms.
    """
    F = tip_pos.shape[-2]

    def psdf(pl):
        return sdfm.plug_sdf(
            pl, kind_onehot[..., None, :], plug_hx[..., None], plug_hy[..., None],
            plug_length[..., None],
        )

    def query(points_w):
        inv_q, inv_t = rot.tf_inverse(plug_q, plug_pos)
        p_local = inv_t[..., None, :] + rot.quat_apply(inv_q[..., None, :], points_w)
        d, pullback = jax.vjp(psdf, p_local)
        (g,) = pullback(jnp.ones_like(d))
        out_local = g / jnp.linalg.norm(g, axis=-1, keepdims=True).clip(1e-9)
        return d, rot.quat_apply(plug_q[..., None, :], out_local)

    # pass 1: pad centers → contact normal → tangent basis of each pad
    d_c, out_c = query(tip_pos)
    ref = jnp.zeros_like(out_c).at[..., 2].set(1.0)
    ref = jnp.where(jnp.abs(out_c[..., 2:3]) > 0.9,
                    jnp.zeros_like(out_c).at[..., 0].set(1.0), ref)
    t1 = jnp.cross(out_c, ref)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True).clip(1e-9)
    t2 = jnp.cross(out_c, t1)

    off = PATCH_RING_FRAC * radius
    offsets = jnp.stack(
        [jnp.zeros_like(t1), off * t1, -off * t1, off * t2, -off * t2], axis=-2
    )  # [N, F, P, 3]
    pts = tip_pos[..., None, :] + offsets                       # [N, F, P, 3]
    pts_flat = pts.reshape(pts.shape[:-3] + (F * PATCH_POINTS, 3))

    # pass 2: all patch points
    d, out_w = query(pts_flat)

    contact_pt = pts_flat - out_w * jnp.minimum(d, radius)[..., None]
    r = contact_pt - plug_com_w[..., None, :]
    vel = jnp.repeat(tip_vel, PATCH_POINTS, axis=-2)
    mu = jnp.broadcast_to(mat.mu_finger[..., None], d.shape)
    # ring points sit off-axis on the spherical pad: the gel only extends
    # sqrt(R² − off²) there, so their indentation depth uses the reduced
    # effective radius (full R would overestimate edge forces on plugs with
    # curvature comparable to the pad radius)
    ring_r = radius * float(np.sqrt(1.0 - PATCH_RING_FRAC**2))
    radius_pt = jnp.tile(
        jnp.asarray([radius] + [ring_r] * (PATCH_POINTS - 1), d.dtype), F
    )
    cs = ContactSet(
        r=r,
        n=-out_w,                       # pad pushes the plug inward along −outward
        depth=radius_pt - d,
        v_other=vel,
        mu=mu,
        weight=jnp.ones_like(d),
        stiffness=jnp.full_like(d, GEL_STIFFNESS / PATCH_POINTS),
    )
    aux_pt = contact_pt.reshape(pts.shape)[..., 0, :]  # pad-center contacts
    return cs, FingerContactAux(contact_point=aux_pt, normal=-out_c)


def concat_contacts(*sets: ContactSet) -> ContactSet:
    return ContactSet(*[jnp.concatenate(parts, axis=-2 if parts[0].ndim >= 3 else -1)
                        for parts in zip(*sets)])
