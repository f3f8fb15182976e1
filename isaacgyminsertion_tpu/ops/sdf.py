"""Analytic signed-distance functions for every peg/hole family (pure JAX).

The reference ships 116 .obj meshes and uses PhysX SDF collision + Open3D
RaycastingScene + trimesh sampling (factory_env_insertion.py:60-447). All seven
subassembly families are parametric solids, so here each is an *analytic* SDF
with per-env shape parameters — a single batched code path feeds contact
generation, extrinsic-contact ground truth, the depth camera ray-marcher and the
tactile gel renderer, entirely on-device.

Canonical frames:
  - plug:   base center at origin, +z up, extruded over z in [0, length]
  - socket: plate base center at origin, +z up, plate over z in [0, height],
            hole through the full plate, centered on the z-axis.

Cross-section families (kind codes):
  0 circle    half-extents (r, r)        round pegs/holes
  1 box       (hx, hy)                   rectangular / square
  2 hexagon   regular, across-flats 2*hx (depth = across-corners = 4*hx/sqrt(3))
  3 ellipse   semi-axes (hx, hy)
  4 trapezoid bottom half-width hx, top half-width TRAPEZOID_TOP_RATIO*hx,
              half-height hy
  5 triangle  isosceles: base 2*hx at y=-hy, apex at y=+hy

All SDF formulas are the standard exact constructions (Inigo Quilez's canonical
2D/3D SDF catalog); the ellipse uses the well-known quadratic approximation
(exact on the axes, <1% relative error elsewhere) to stay iteration-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def _safe_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """Norm with a well-defined (zero) gradient at x=0 (needed for sdf_normal)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-18)


NUM_KINDS = 6
KIND_CIRCLE, KIND_BOX, KIND_HEXAGON, KIND_ELLIPSE, KIND_TRAPEZOID, KIND_TRIANGLE = range(6)
TRAPEZOID_TOP_RATIO = 0.6

# ------------------------------------------------------------------ 2D sections


def sd_circle(p: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    del hy
    return _safe_norm(p) - hx


def sd_box2d(p: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    d = jnp.abs(p) - jnp.stack([hx, hy], axis=-1)
    return _safe_norm(jnp.maximum(d, 0.0)) + jnp.minimum(jnp.maximum(d[..., 0], d[..., 1]), 0.0)


def sd_hexagon(p: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    """Regular hexagon, apothem hx (across-flats = 2*hx); hy ignored."""
    del hy
    kx, ky, kz = -0.8660254037844386, 0.5, 0.5773502691896258
    q = jnp.abs(p)
    dot = kx * q[..., 0] + ky * q[..., 1]
    q = q - 2.0 * jnp.minimum(dot, 0.0)[..., None] * jnp.stack(
        [jnp.full_like(dot, kx), jnp.full_like(dot, ky)], axis=-1
    )
    qx = q[..., 0].clip(-kz * hx, kz * hx)
    d = jnp.stack([q[..., 0] - qx, q[..., 1] - hx], axis=-1)
    return _safe_norm(d) * jnp.sign(q[..., 1] - hx)


def sd_ellipse(p: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    """Approximate ellipse SDF: d = k0*(k0-1)/k1 (exact on axes).

    All norms are gradient-safe (_safe_norm): these SDFs are differentiated
    for contact normals, and a plain norm/sqrt has a NaN gradient exactly at
    its zero — which then poisons every kind through the one-hot blend
    (0 · NaN = NaN in the vjp)."""
    ab = jnp.stack([hx, hy], axis=-1)
    k0 = _safe_norm(p / ab)
    k1 = _safe_norm(p / (ab * ab)).clip(1e-9)
    return jnp.where(k0 < 1e-6, -jnp.minimum(hx, hy), k0 * (k0 - 1.0) / k1)


def _sd_segment(p: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    pa = p - a
    ba = b - a
    h = (jnp.sum(pa * ba, axis=-1) / jnp.sum(ba * ba, axis=-1).clip(1e-12)).clip(0.0, 1.0)
    return _safe_norm(pa - ba * h[..., None])


def sd_trapezoid(p: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    """Isosceles trapezoid, **centroid-centered**: bottom half-width hx, top
    TRAPEZOID_TOP_RATIO*hx, height 2*hy. Centroid at the origin so the plug
    com sits on the extrusion axis (engine assumes com = (0, 0, com_z))."""
    r1, r2, he = hx, TRAPEZOID_TOP_RATIO * hx, hy
    px = jnp.abs(p[..., 0])
    # centroid height from mid-plane: ȳ = (h/3)(b+2t)/(b+t) − h/2 with b=2hx, t=2r2
    y_c = 2.0 * hy * (r1 + 2.0 * r2) / (3.0 * (r1 + r2)) - hy
    py = p[..., 1] + y_c
    k1 = jnp.stack([r2, he], axis=-1)
    k2 = jnp.stack([r2 - r1, 2.0 * he], axis=-1)
    pq = jnp.stack([px, py], axis=-1)
    ca_x = px - jnp.minimum(px, jnp.where(py < 0.0, r1, r2))
    ca_y = jnp.abs(py) - he
    ca = jnp.stack([ca_x, ca_y], axis=-1)
    t = ((jnp.sum((k1 - pq) * k2, axis=-1)) / jnp.sum(k2 * k2, axis=-1).clip(1e-12)).clip(0.0, 1.0)
    cb = pq - k1 + k2 * t[..., None]
    s = jnp.where((cb[..., 0] < 0.0) & (ca[..., 1] < 0.0), -1.0, 1.0)
    d2 = jnp.minimum(jnp.sum(ca * ca, axis=-1), jnp.sum(cb * cb, axis=-1))
    # +eps: sqrt'(0) = inf exactly on the outline — a contact point landing
    # there poisons all section kinds through the one-hot blend vjp
    return s * jnp.sqrt(d2 + 1e-18)


def sd_triangle_iso(p: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    """Isosceles triangle, **centroid-centered**: base 2*hx, height 2*hy
    (base at y=-2hy/3, apex at y=+4hy/3). Exact (point-segment)."""
    y0 = -2.0 * hy / 3.0
    a = jnp.stack([-hx, y0], axis=-1)
    b = jnp.stack([hx, y0], axis=-1)
    c = jnp.stack([jnp.zeros_like(hx), y0 + 2.0 * hy], axis=-1)
    d = jnp.minimum(jnp.minimum(_sd_segment(p, a, b), _sd_segment(p, b, c)), _sd_segment(p, c, a))
    # inside test via half-plane signs (CCW triangle)
    def edge(e0, e1):
        return (e1[..., 0] - e0[..., 0]) * (p[..., 1] - e0[..., 1]) - (e1[..., 1] - e0[..., 1]) * (
            p[..., 0] - e0[..., 0]
        )
    inside = (edge(a, b) > 0) & (edge(b, c) > 0) & (edge(c, a) > 0)
    return jnp.where(inside, -d, d)


_SECTION_FNS = (sd_circle, sd_box2d, sd_hexagon, sd_ellipse, sd_trapezoid, sd_triangle_iso)


def section_sdf(p2: jax.Array, kind_onehot: jax.Array, hx: jax.Array, hy: jax.Array) -> jax.Array:
    """2D cross-section SDF blended by one-hot kind (vectorized over mixed batches).

    All six formulas are a handful of VPU flops; computing all and selecting is
    far cheaper on TPU than data-dependent branching.
    """
    ds = jnp.stack([fn(p2, hx, hy) for fn in _SECTION_FNS], axis=-1)  # [..., 6]
    return jnp.sum(ds * kind_onehot, axis=-1)


# ------------------------------------------------------------------ 3D solids


def extrude(d2: jax.Array, z: jax.Array, half_len: jax.Array, z_center: jax.Array) -> jax.Array:
    """Extrude a 2D SDF over z in [z_center-half_len, z_center+half_len]."""
    wz = jnp.abs(z - z_center) - half_len
    dx = jnp.maximum(d2, 0.0)
    dz = jnp.maximum(wz, 0.0)
    return jnp.sqrt(dx * dx + dz * dz + 1e-18) + jnp.minimum(jnp.maximum(d2, wz), 0.0)


def plug_sdf(p: jax.Array, kind_onehot: jax.Array, hx: jax.Array, hy: jax.Array, length: jax.Array) -> jax.Array:
    """Plug solid SDF in the canonical plug frame (base at z=0, +z up)."""
    d2 = section_sdf(p[..., :2], kind_onehot, hx, hy)
    return extrude(d2, p[..., 2], 0.5 * length, 0.5 * length)


def socket_sdf(
    p: jax.Array,
    kind_onehot: jax.Array,
    hole_hx: jax.Array,
    hole_hy: jax.Array,
    height: jax.Array,
    plate_hx: jax.Array,
    plate_hy: jax.Array,
) -> jax.Array:
    """Socket = rectangular plate (z in [0, height]) minus a through-hole."""
    plate2 = sd_box2d(p[..., :2], plate_hx, plate_hy)
    plate = extrude(plate2, p[..., 2], 0.5 * height, 0.5 * height)
    hole2 = section_sdf(p[..., :2], kind_onehot, hole_hx, hole_hy)
    return jnp.maximum(plate, -hole2)


def table_sdf(p: jax.Array, table_height: jax.Array) -> jax.Array:
    """Table top as a halfspace z >= table_height (the plate under the socket)."""
    return p[..., 2] - table_height


def sdf_normal(sdf_fn, p: jax.Array, *args) -> jax.Array:
    """Unit outward normal via analytic gradient of the SDF."""
    g = jax.grad(lambda q: jnp.sum(sdf_fn(q, *args)))(p)
    return g / jnp.linalg.norm(g, axis=-1, keepdims=True).clip(1e-9)


# ------------------------------------------------------------- plane (SoA) form
# Same formulas in coordinate-plane layout: every function takes [.., P]
# x/y(/z) planes plus [.., 1]-broadcastable shape scalars and returns a
# [.., P] distance plane. On TPU this is the fast layout for point batches —
# an [N, P, 3] point array pads its minor axis 3 → 128 lanes (~42× the bytes
# and VPU work), while [N, P] planes pad only P to the next lane multiple.
# Used by the Pallas renderers (sensors/render_pallas.py) and batched contact
# generation (physics/contact.py); the vector forms above are the oracle in
# the parity tests (tests/test_sdf.py, tests/test_render_pallas.py).


def _pnorm2(x, y):
    return jnp.sqrt(x * x + y * y + 1e-18)


def plane_sd_circle(px, py, hx, hy):
    del hy
    return _pnorm2(px, py) - hx


def plane_sd_box2d(px, py, hx, hy):
    dx = jnp.abs(px) - hx
    dy = jnp.abs(py) - hy
    return _pnorm2(jnp.maximum(dx, 0.0), jnp.maximum(dy, 0.0)) + jnp.minimum(
        jnp.maximum(dx, dy), 0.0
    )


def plane_sd_hexagon(px, py, hx, hy):
    del hy
    kx, ky, kz = -0.8660254037844386, 0.5, 0.5773502691896258
    qx, qy = jnp.abs(px), jnp.abs(py)
    dot = kx * qx + ky * qy
    m = 2.0 * jnp.minimum(dot, 0.0)
    qx = qx - m * kx
    qy = qy - m * ky
    cx = qx.clip(-kz * hx, kz * hx)
    return _pnorm2(qx - cx, qy - hx) * jnp.sign(qy - hx)


def plane_sd_ellipse(px, py, hx, hy):
    ex, ey = px / hx, py / hy
    k0 = jnp.sqrt(ex * ex + ey * ey + 1e-18)
    fx, fy = px / (hx * hx), py / (hy * hy)
    k1 = jnp.maximum(jnp.sqrt(fx * fx + fy * fy + 1e-18), 1e-9)
    return jnp.where(k0 < 1e-6, -jnp.minimum(hx, hy), k0 * (k0 - 1.0) / k1)


def plane_sd_trapezoid(px_in, py_in, hx, hy):
    r1 = hx
    r2 = TRAPEZOID_TOP_RATIO * hx
    he = hy
    px = jnp.abs(px_in)
    y_c = 2.0 * hy * (r1 + 2.0 * r2) / (3.0 * (r1 + r2)) - hy
    py = py_in + y_c
    k1x, k1y = r2, he
    k2x, k2y = r2 - r1, 2.0 * he
    ca_x = px - jnp.minimum(px, jnp.where(py < 0.0, r1, r2))
    ca_y = jnp.abs(py) - he
    k2n = jnp.maximum(k2x * k2x + k2y * k2y, 1e-12)
    t = (((k1x - px) * k2x + (k1y - py) * k2y) / k2n).clip(0.0, 1.0)
    cbx = px - k1x + k2x * t
    cby = py - k1y + k2y * t
    s = jnp.where((cbx < 0.0) & (ca_y < 0.0), -1.0, 1.0)
    d2 = jnp.minimum(ca_x * ca_x + ca_y * ca_y, cbx * cbx + cby * cby)
    return s * jnp.sqrt(d2 + 1e-18)


def plane_sd_segment(px, py, ax, ay, bx, by):
    pax, pay = px - ax, py - ay
    bax, bay = bx - ax, by - ay
    h = ((pax * bax + pay * bay) / jnp.maximum(bax * bax + bay * bay, 1e-12)).clip(0.0, 1.0)
    return _pnorm2(pax - bax * h, pay - bay * h)


def plane_sd_triangle_iso(px, py, hx, hy):
    y0 = -2.0 * hy / 3.0
    ax, ay = -hx, y0
    bx, by = hx, y0
    cx, cy = jnp.zeros_like(hx), y0 + 2.0 * hy
    d = jnp.minimum(
        jnp.minimum(plane_sd_segment(px, py, ax, ay, bx, by),
                    plane_sd_segment(px, py, bx, by, cx, cy)),
        plane_sd_segment(px, py, cx, cy, ax, ay),
    )

    def edge(e0x, e0y, e1x, e1y):
        return (e1x - e0x) * (py - e0y) - (e1y - e0y) * (px - e0x)

    inside = (
        (edge(ax, ay, bx, by) > 0)
        & (edge(bx, by, cx, cy) > 0)
        & (edge(cx, cy, ax, ay) > 0)
    )
    return jnp.where(inside, -d, d)


PLANE_SECTION_FNS = (plane_sd_circle, plane_sd_box2d, plane_sd_hexagon,
                     plane_sd_ellipse, plane_sd_trapezoid, plane_sd_triangle_iso)


def section_sdf_planes(px, py, oh, hx, hy):
    """One-hot blend of the six section families. oh: sequence of 6 planes
    (each [.., 1]-broadcastable against px/py)."""
    d = None
    for k, fn in enumerate(PLANE_SECTION_FNS):
        dk = fn(px, py, hx, hy) * oh[k]
        d = dk if d is None else d + dk
    return d


def extrude_planes(d2, z, half_len, z_center):
    wz = jnp.abs(z - z_center) - half_len
    dx = jnp.maximum(d2, 0.0)
    dz = jnp.maximum(wz, 0.0)
    return jnp.sqrt(dx * dx + dz * dz + 1e-18) + jnp.minimum(jnp.maximum(d2, wz), 0.0)


def plug_sdf_planes(px, py, pz, oh, hx, hy, length):
    d2 = section_sdf_planes(px, py, oh, hx, hy)
    return extrude_planes(d2, pz, 0.5 * length, 0.5 * length)


def socket_sdf_planes(px, py, pz, oh, hole_hx, hole_hy, height,
                      plate_hx: float, plate_hy: float):
    plate2 = plane_sd_box2d(px, py, jnp.full_like(hole_hx, plate_hx),
                            jnp.full_like(hole_hx, plate_hy))
    plate = extrude_planes(plate2, pz, 0.5 * height, 0.5 * height)
    hole2 = section_sdf_planes(px, py, oh, hole_hx, hole_hy)
    return jnp.maximum(plate, -hole2)
