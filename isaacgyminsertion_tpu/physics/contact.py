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
    (assets.SOCKET_PT_COUNT / TABLE_PT_IDX split) → [N, Ps+Pt].

    Internals run in coordinate-plane (SoA) layout: every [N, P, 3] point op
    pads its minor axis 3 → 128 TPU lanes (~42× the bytes/VPU work), so the
    transforms, SDF query and gradient all operate on [N, P] x/y/z planes
    (rotations as 9 scalar-broadcast madds) and the AoS ContactSet fields are
    assembled once at the end. Same math as the vector form (ops/sdf.py) —
    contact_gen was the top physics cost at 9.4 ms/substep @8192 envs."""
    dtype = plug_pos.dtype

    Rp = rot.quat_to_matrix(plug_q)                   # [N, 3, 3]
    Rs = rot.quat_to_matrix(socket_q)
    rp = lambda i, j: Rp[..., i, j][..., None]        # [N, 1] scalars
    rs_ = lambda i, j: Rs[..., i, j][..., None]
    col = lambda v, i: v[..., i][..., None]

    def to_world(pts):                                # [N, P, 3] → 3×[N, P]
        lx, ly, lz = pts[..., 0], pts[..., 1], pts[..., 2]
        wx = rp(0, 0) * lx + rp(0, 1) * ly + rp(0, 2) * lz + col(plug_pos, 0)
        wy = rp(1, 0) * lx + rp(1, 1) * ly + rp(1, 2) * lz + col(plug_pos, 1)
        wz = rp(2, 0) * lx + rp(2, 1) * ly + rp(2, 2) * lz + col(plug_pos, 2)
        return wx, wy, wz

    # ---- socket SDF (socket frame)
    wx, wy, wz = to_world(socket_points)
    # socket frame: p_s = Rsᵀ (w − t_s)
    dxw = wx - col(socket_pos, 0)
    dyw = wy - col(socket_pos, 1)
    dzw = wz - col(socket_pos, 2)
    sx = rs_(0, 0) * dxw + rs_(1, 0) * dyw + rs_(2, 0) * dzw
    sy = rs_(0, 1) * dxw + rs_(1, 1) * dyw + rs_(2, 1) * dzw
    sz = rs_(0, 2) * dxw + rs_(1, 2) * dyw + rs_(2, 2) * dzw

    from ..assets import SOCKET_PLATE_HX, SOCKET_PLATE_HY

    oh = tuple(kind_onehot[..., k][..., None] for k in range(kind_onehot.shape[-1]))

    def sock_sdf(px, py, pz):
        return sdfm.socket_sdf_planes(
            px, py, pz, oh, hole_hx[..., None], hole_hy[..., None],
            socket_height[..., None], float(SOCKET_PLATE_HX), float(SOCKET_PLATE_HY),
        )

    d_s, pullback = jax.vjp(sock_sdf, sx, sy, sz)
    gx, gy, gz = pullback(jnp.ones_like(d_s))
    gn = jnp.sqrt(gx * gx + gy * gy + gz * gz).clip(1e-9)
    gx, gy, gz = gx / gn, gy / gn, gz / gn
    # normal back to world (pushes plug out of socket): n_w = Rs n_local
    nx = rs_(0, 0) * gx + rs_(0, 1) * gy + rs_(0, 2) * gz
    ny = rs_(1, 0) * gx + rs_(1, 1) * gy + rs_(1, 2) * gz
    nz = rs_(2, 0) * gx + rs_(2, 1) * gy + rs_(2, 2) * gz

    rsx = wx - col(plug_com_w, 0)
    rsy = wy - col(plug_com_w, 1)
    rsz = wz - col(plug_com_w, 2)

    shape = d_s.shape
    cs_socket = ContactSet(
        r=jnp.stack([rsx, rsy, rsz], axis=-1),
        n=jnp.stack([nx, ny, nz], axis=-1),
        depth=-d_s,
        v_other=jnp.zeros(shape + (3,), dtype),
        mu=jnp.broadcast_to(mat.mu_socket[..., None], shape),
        weight=jnp.broadcast_to(socket_weights, shape),
        stiffness=jnp.zeros(shape, dtype),
    )

    # ---- table halfspace z >= table_height
    tx, ty, tz = to_world(table_points)
    shape_t = tz.shape
    zero = jnp.zeros(shape_t, dtype)
    n_t = jnp.stack([zero, zero, jnp.ones(shape_t, dtype)], axis=-1)
    cs_table = ContactSet(
        r=jnp.stack([tx - col(plug_com_w, 0), ty - col(plug_com_w, 1),
                     tz - col(plug_com_w, 2)], axis=-1),
        n=n_t, depth=table_height[..., None] - tz,
        v_other=jnp.zeros(shape_t + (3,), dtype),
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

    oh = tuple(kind_onehot[..., k][..., None] for k in range(kind_onehot.shape[-1]))

    def psdf(px, py, pz):
        return sdfm.plug_sdf_planes(
            px, py, pz, oh, plug_hx[..., None], plug_hy[..., None],
            plug_length[..., None],
        )

    def query(points_w):
        # plane-form (SoA) SDF query — see plug_env_contacts for rationale
        Rp = rot.quat_to_matrix(plug_q)
        rp = lambda i, j: Rp[..., i, j][..., None]
        col = lambda v, i: v[..., i][..., None]
        dxw = points_w[..., 0] - col(plug_pos, 0)
        dyw = points_w[..., 1] - col(plug_pos, 1)
        dzw = points_w[..., 2] - col(plug_pos, 2)
        # plug frame: p = Rpᵀ (w − t)
        px = rp(0, 0) * dxw + rp(1, 0) * dyw + rp(2, 0) * dzw
        py = rp(0, 1) * dxw + rp(1, 1) * dyw + rp(2, 1) * dzw
        pz = rp(0, 2) * dxw + rp(1, 2) * dyw + rp(2, 2) * dzw
        d, pullback = jax.vjp(psdf, px, py, pz)
        gx, gy, gz = pullback(jnp.ones_like(d))
        gn = jnp.sqrt(gx * gx + gy * gy + gz * gz).clip(1e-9)
        gx, gy, gz = gx / gn, gy / gn, gz / gn
        out_w = jnp.stack(
            [rp(0, 0) * gx + rp(0, 1) * gy + rp(0, 2) * gz,
             rp(1, 0) * gx + rp(1, 1) * gy + rp(1, 2) * gz,
             rp(2, 0) * gx + rp(2, 1) * gy + rp(2, 2) * gz], axis=-1)
        return d, out_w

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
