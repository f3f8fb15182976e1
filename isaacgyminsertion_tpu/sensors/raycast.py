"""Closed-form ray-scene intersection (exact, iteration-free, pure JAX).

Every shape in the scene is analytic (ops/sdf.py families): the plug is an
extruded CONVEX cross-section, the socket a box plate minus a convex through-
hole, the table a halfspace, the robot proxy spheres+capsule. A convex prism's
ray interval is the intersection of half-plane / slab / quadratic intervals —
all closed form — so the depth camera needs ~100 flops/pixel instead of a
24-iteration sphere march (~20× the math). This replaces the marching loops
of sensors/camera.py (parity target: IsaacGym's rasterized camera tensors,
factory_env_insertion.py:940-1003) with exact hits; it is the TPU-friendly
formulation (straight-line elementwise math, no loop-carried dependence).

Conventions: rays are given in each shape's LOCAL frame (origin o, unit dir
d); intervals are [t_in, t_out] with t_in > t_out meaning "miss". BIG is used
instead of inf (inf literals inside jit are a NaN source under 0·inf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sdf import (
    KIND_BOX,
    KIND_CIRCLE,
    KIND_ELLIPSE,
    KIND_HEXAGON,
    KIND_TRAPEZOID,
    KIND_TRIANGLE,
    TRAPEZOID_TOP_RATIO,
)

BIG = 1.0e9
EPS = 1.0e-9


def _halfplane_interval(no, nd, c):
    """t-interval of {t : no + nd·t ≤ c} (scalar plane eval at o and dir).

    no = n·o, nd = n·d. Branchless three-way: nd>0 exit bound, nd<0 entry
    bound, nd≈0 always/never."""
    tc = (c - no) / jnp.where(jnp.abs(nd) < EPS, jnp.where(nd >= 0, EPS, -EPS), nd)
    inside = no <= c
    t_lo = jnp.where(nd < -EPS, tc, jnp.where(nd > EPS, -BIG,
                     jnp.where(inside, -BIG, BIG)))
    t_hi = jnp.where(nd > EPS, tc, jnp.where(nd < -EPS, BIG,
                     jnp.where(inside, BIG, -BIG)))
    return t_lo, t_hi


def _slab_interval(o, d, lo, hi):
    """t-interval of {lo ≤ o + d·t ≤ hi} (1D slab)."""
    l1, h1 = _halfplane_interval(o, d, hi)        # o + d t ≤ hi
    l2, h2 = _halfplane_interval(-o, -d, -lo)     # o + d t ≥ lo
    return jnp.maximum(l1, l2), jnp.minimum(h1, h2)


def _quadratic_interval(a, b, c):
    """t-interval of {a t² + 2b t + c ≤ 0} with a > 0 (ellipse/circle)."""
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.maximum(a, EPS)
    t_lo = (-b - sq) * inv_a
    t_hi = (-b + sq) * inv_a
    miss = disc <= 0.0
    return jnp.where(miss, BIG, t_lo), jnp.where(miss, -BIG, t_hi)


# ------------------------------------------------------------------ sections
# Each returns the t-interval where the ray's xy-projection is inside the 2D
# cross-section. ox/oy, dx/dy: ray origin/dir xy in the section frame;
# hx/hy: per-env half-extents (broadcast against the pixel axes).


def _circle_interval(ox, oy, dx, dy, hx, hy):
    del hy
    a = dx * dx + dy * dy
    b = ox * dx + oy * dy
    c = ox * ox + oy * oy - hx * hx
    return _quadratic_interval(jnp.maximum(a, EPS), b, c)


def _ellipse_interval(ox, oy, dx, dy, hx, hy):
    sx, sy = 1.0 / hx, 1.0 / hy
    return _circle_interval(ox * sx, oy * sy, dx * sx, dy * sy,
                            jnp.ones_like(hx), None)


def _box_interval(ox, oy, dx, dy, hx, hy):
    lx, hx_ = _slab_interval(ox, dx, -hx, hx)
    ly, hy_ = _slab_interval(oy, dy, -hy, hy)
    return jnp.maximum(lx, ly), jnp.minimum(hx_, hy_)


def _hexagon_interval(ox, oy, dx, dy, hx, hy):
    """Regular hexagon with apothem hx = ∩ of 3 slabs |u_k·p| ≤ hx,
    flats normal to u = (0,1), (±√3/2, 1/2)."""
    del hy
    s3 = 0.8660254037844386
    t_lo, t_hi = _slab_interval(oy, dy, -hx, hx)
    for ux, uy in ((s3, 0.5), (-s3, 0.5)):
        l, h = _slab_interval(ux * ox + uy * oy, ux * dx + uy * dy, -hx, hx)
        t_lo, t_hi = jnp.maximum(t_lo, l), jnp.minimum(t_hi, h)
    return t_lo, t_hi


def _triangle_interval(ox, oy, dx, dy, hx, hy):
    """Isosceles triangle, centroid-centered (sd_triangle_iso): vertices
    a=(-hx, y0), b=(hx, y0), c=(0, y0+2hy) with y0 = -2hy/3."""
    y0 = -2.0 * hy / 3.0
    # base edge: y ≥ y0  ⇔  -y ≤ -y0
    t_lo, t_hi = _halfplane_interval(-oy, -dy, -y0)
    # right edge b→c: inward normal n = (-(2hy), -(hx)) normalized — use
    # unnormalized n·p ≤ n·b form: edge dir e = c-b = (-hx, 2hy); outward
    # normal m = (2hy, hx); constraint m·p ≤ m·b
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * hy, hx
        cb = mx * (sx * hx) + my * y0
        l, h = _halfplane_interval(mx * ox + my * oy, mx * dx + my * dy, cb)
        t_lo, t_hi = jnp.maximum(t_lo, l), jnp.minimum(t_hi, h)
    return t_lo, t_hi


def _trapezoid_interval(ox, oy, dx, dy, hx, hy):
    """Isosceles trapezoid, centroid-centered (sd_trapezoid): bottom
    half-width hx at y=-he, top r2 = ratio·hx at y=+he, shifted by centroid."""
    r1, r2, he = hx, TRAPEZOID_TOP_RATIO * hx, hy
    y_c = 2.0 * hy * (r1 + 2.0 * r2) / (3.0 * (r1 + r2)) - hy
    oy = oy + y_c  # to the mid-plane frame used by sd_trapezoid
    t_lo, t_hi = _slab_interval(oy, dy, -he, he)
    # side edges from (r1, -he) to (r2, +he): outward normal m = (2he, r1-r2)
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * he, r1 - r2
        cb = mx * (sx * r1) + my * (-he)
        l, h = _halfplane_interval(mx * ox + my * oy, mx * dx + my * dy, cb)
        t_lo, t_hi = jnp.maximum(t_lo, l), jnp.minimum(t_hi, h)
    return t_lo, t_hi


_SECTION_INTERVALS = {
    KIND_CIRCLE: _circle_interval,
    KIND_BOX: _box_interval,
    KIND_HEXAGON: _hexagon_interval,
    KIND_ELLIPSE: _ellipse_interval,
    KIND_TRAPEZOID: _trapezoid_interval,
    KIND_TRIANGLE: _triangle_interval,
}


# ------------------------------------------------------- entry-face normals
# Each *_interval_n variant also returns the (unnormalized) outward 2D normal
# of the BINDING entry constraint — the normal is a byproduct of the interval
# math (which face's lower bound won), so shading needs NO SDF gradient
# evaluations (the tetrahedron-FD normal was ~65% of the per-ray flops in the
# fused tactile kernel). Magnitudes are only consistent within one family;
# callers select one family per env (one-hot) and normalize once at the end.


def _circle_interval_n(ox, oy, dx, dy, hx, hy):
    lo, hi = _circle_interval(ox, oy, dx, dy, hx, hy)
    return lo, hi, ox + dx * lo, oy + dy * lo  # radial


def _ellipse_interval_n(ox, oy, dx, dy, hx, hy):
    lo, hi = _ellipse_interval(ox, oy, dx, dy, hx, hy)
    px, py = ox + dx * lo, oy + dy * lo
    return lo, hi, px / (hx * hx), py / (hy * hy)  # implicit-fn gradient


def _box_interval_n(ox, oy, dx, dy, hx, hy):
    lx, hxi = _slab_interval(ox, dx, -hx, hx)
    ly, hyi = _slab_interval(oy, dy, -hy, hy)
    xdom = lx >= ly
    z = jnp.zeros_like(lx)
    nx = jnp.where(xdom, -jnp.sign(dx), z)
    ny = jnp.where(xdom, z, -jnp.sign(dy))
    return jnp.maximum(lx, ly), jnp.minimum(hxi, hyi), nx, ny


def _hexagon_interval_n(ox, oy, dx, dy, hx, hy):
    del hy
    s3 = 0.8660254037844386
    axes = ((0.0, 1.0), (s3, 0.5), (-s3, 0.5))
    lo = hi = nx = ny = None
    for ux, uy in axes:
        l, h = _slab_interval(ux * ox + uy * oy, ux * dx + uy * dy, -hx, hx)
        s = -jnp.sign(ux * dx + uy * dy)  # entry side of the slab
        if lo is None:
            lo, hi, nx, ny = l, h, s * ux, s * uy
        else:
            dom = l > lo
            nx = jnp.where(dom, s * ux, nx)
            ny = jnp.where(dom, s * uy, ny)
            lo, hi = jnp.maximum(lo, l), jnp.minimum(hi, h)
    return lo, hi, nx, ny


def _triangle_interval_n(ox, oy, dx, dy, hx, hy):
    y0 = -2.0 * hy / 3.0
    lo, hi = _halfplane_interval(-oy, -dy, -y0)
    nx, ny = jnp.zeros_like(lo), -jnp.ones_like(lo)
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * hy, hx
        cb = mx * (sx * hx) + my * y0
        l, h = _halfplane_interval(mx * ox + my * oy, mx * dx + my * dy, cb)
        dom = l > lo
        nx = jnp.where(dom, mx, nx)
        ny = jnp.where(dom, my, ny)
        lo, hi = jnp.maximum(lo, l), jnp.minimum(hi, h)
    return lo, hi, nx, ny


def _trapezoid_interval_n(ox, oy, dx, dy, hx, hy):
    r1, r2, he = hx, TRAPEZOID_TOP_RATIO * hx, hy
    y_c = 2.0 * hy * (r1 + 2.0 * r2) / (3.0 * (r1 + r2)) - hy
    oy = oy + y_c
    lo, hi = _slab_interval(oy, dy, -he, he)
    nx, ny = jnp.zeros_like(lo), -jnp.sign(dy)
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * he, r1 - r2
        cb = mx * (sx * r1) + my * (-he)
        l, h = _halfplane_interval(mx * ox + my * oy, mx * dx + my * dy, cb)
        dom = l > lo
        nx = jnp.where(dom, mx, nx)
        ny = jnp.where(dom, my, ny)
        lo, hi = jnp.maximum(lo, l), jnp.minimum(hi, h)
    return lo, hi, nx, ny


_SECTION_INTERVAL_NORMALS = (
    _circle_interval_n, _box_interval_n, _hexagon_interval_n,
    _ellipse_interval_n, _trapezoid_interval_n, _triangle_interval_n,
)


# ------------------------------------------------------- interior gradients
# (d2, gx, gy) at a 2D point assumed INSIDE the section: true signed distance
# (needed to arbitrate side-wall vs end-cap for the 3D prism) + outward
# gradient direction (unnormalized — callers normalize once at the end; the
# one-hot blend keeps exactly one family's value). Used for rays whose ORIGIN
# is already inside the prism (deep gel indentation): no entry constraint
# exists there, so the entry-face normal is undefined and shading must use the
# nearest-face gradient — the same thing the march's FD normal converges to.


def _circle_grad(px, py, hx, hy):
    del hy
    r = jnp.sqrt(px * px + py * py + 1e-18)
    return r - hx, px, py


def _box_grad(px, py, hx, hy):
    ax, ay = jnp.abs(px) - hx, jnp.abs(py) - hy
    xdom = ax >= ay
    z = jnp.zeros_like(ax)
    return (jnp.maximum(ax, ay),
            jnp.where(xdom, jnp.sign(px), z),
            jnp.where(xdom, z, jnp.sign(py)))


def _hexagon_grad(px, py, hx, hy):
    del hy
    s3 = 0.8660254037844386
    d = gx = gy = None
    for ux, uy in ((0.0, 1.0), (s3, 0.5), (-s3, 0.5)):
        u = ux * px + uy * py
        dk = jnp.abs(u) - hx
        s = jnp.sign(u)
        if d is None:
            d, gx, gy = dk, s * ux, s * uy
        else:
            dom = dk > d
            gx = jnp.where(dom, s * ux, gx)
            gy = jnp.where(dom, s * uy, gy)
            d = jnp.maximum(d, dk)
    return d, gx, gy


def _ellipse_grad(px, py, hx, hy):
    # same approximate distance as ops/sdf.sd_ellipse (d = k0(k0-1)/k1) AND
    # its analytic gradient — matching the march path's FD/vjp direction
    rx, ry = px / (hx * hx), py / (hy * hy)
    k0 = jnp.sqrt((px / hx) ** 2 + (py / hy) ** 2 + 1e-18)
    k1 = jnp.sqrt(rx * rx + ry * ry).clip(1e-9)
    c1 = (2.0 * k0 - 1.0) / (jnp.maximum(k0, 1e-9) * k1)
    c2 = k0 * (k0 - 1.0) / (k1 * k1 * k1)
    gx = c1 * rx - c2 * rx / (hx * hx)
    gy = c1 * ry - c2 * ry / (hy * hy)
    return k0 * (k0 - 1.0) / k1, gx, gy


def _triangle_grad(px, py, hx, hy):
    y0 = -2.0 * hy / 3.0
    d, gx, gy = y0 - py, jnp.zeros_like(px), -jnp.ones_like(px)
    inv = 1.0 / jnp.sqrt(4.0 * hy * hy + hx * hx)
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * hy, hx
        cb = mx * (sx * hx) + my * y0
        dk = (mx * px + my * py - cb) * inv
        dom = dk > d
        gx = jnp.where(dom, mx, gx)
        gy = jnp.where(dom, my, gy)
        d = jnp.maximum(d, dk)
    return d, gx, gy


def _trapezoid_grad(px, py, hx, hy):
    r1, r2, he = hx, TRAPEZOID_TOP_RATIO * hx, hy
    y_c = 2.0 * hy * (r1 + 2.0 * r2) / (3.0 * (r1 + r2)) - hy
    py = py + y_c
    d, gx, gy = jnp.abs(py) - he, jnp.zeros_like(px), jnp.sign(py)
    inv = 1.0 / jnp.sqrt(4.0 * he * he + (r1 - r2) ** 2)
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * he, r1 - r2
        cb = mx * (sx * r1) + my * (-he)
        dk = (mx * px + my * py - cb) * inv
        dom = dk > d
        gx = jnp.where(dom, mx, gx)
        gy = jnp.where(dom, my, gy)
        d = jnp.maximum(d, dk)
    return d, gx, gy


_SECTION_INNER_GRADS = (
    _circle_grad, _box_grad, _hexagon_grad,
    _ellipse_grad, _trapezoid_grad, _triangle_grad,
)


# ------------------------------------------------- packed section (unified)
# Every section family is {p : u_j·p ≤ c_j ∀j} ∩ {|(x/a, y/b)| ≤ 1}: at most
# HP_SLOTS unit-normal halfplanes plus an optional axis-aligned quadratic.
# Packing the active family's constraints per env at reset collapses the
# six-family one-hot evaluation (6 interval fns + 6 interior-grad fns per
# pixel) into ONE constraint sweep — ~2× fewer flops in the tactile/camera
# Pallas kernels, where the section math dominates per-ray cost. Neutral
# slots are (0, 0, BIG): always satisfied, never bind, never dominate.

HP_SLOTS = 6
_S3 = 0.8660254037844386


def section_halfplanes(kind_onehot, hx, hy):
    """Pack per-env section constraints: (hp [..., HP_SLOTS, 3], quad [..., 3]).

    hp rows are (ux, uy, c) with |u| = 1 meaning u·p ≤ c; quad is
    (1/a, 1/b, active) meaning (x/a)² + (y/b)² ≤ 1 when active = 1.
    One-hot blended over the six families (exactly one contributes)."""
    z = jnp.zeros_like(hx)
    one = jnp.ones_like(hx)
    big = jnp.full_like(hx, BIG)
    neutral = (z, z, big)

    def fam(rows, quad):
        rows = list(rows) + [neutral] * (HP_SLOTS - len(rows))
        hp = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
        return hp, jnp.stack(quad, axis=-1)

    inv_x, inv_y = 1.0 / hx, 1.0 / hy
    circle = fam([], (inv_x, inv_x, one))
    ellipse = fam([], (inv_x, inv_y, one))
    box = fam([(one, z, hx), (-one, z, hx), (z, one, hy), (z, -one, hy)],
              (z, z, z))
    s3 = jnp.full_like(hx, _S3)
    hexa = fam([(z, one, hx), (z, -one, hx),
                (s3, 0.5 * one, hx), (-s3, -0.5 * one, hx),
                (-s3, 0.5 * one, hx), (s3, -0.5 * one, hx)], (z, z, z))
    # triangle (sd_triangle_iso frame): base y ≥ y0, two side edges
    y0 = -2.0 * hy / 3.0
    li = 1.0 / jnp.sqrt(4.0 * hy * hy + hx * hx)
    tri_rows = [(z, -one, -y0)]
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * hy, hx
        cb = mx * (sx * hx) + my * y0
        tri_rows.append((mx * li, my * li, cb * li))
    tri = fam(tri_rows, (z, z, z))
    # trapezoid (sd_trapezoid frame shifted by centroid y_c)
    r1, r2, he = hx, TRAPEZOID_TOP_RATIO * hx, hy
    y_c = 2.0 * hy * (r1 + 2.0 * r2) / (3.0 * (r1 + r2)) - hy
    ti = 1.0 / jnp.sqrt(4.0 * he * he + (r1 - r2) ** 2)
    trap_rows = [(z, one, he - y_c), (z, -one, he + y_c)]
    for sx in (1.0, -1.0):
        mx, my = sx * 2.0 * he, r1 - r2
        cb = mx * (sx * r1) + my * (-he) - my * y_c  # back to unshifted frame
        trap_rows.append((mx * ti, my * ti, cb * ti))
    trap = fam(trap_rows, (z, z, z))

    fams = (circle, box, hexa, ellipse, trap, tri)  # KIND_* order
    hp = sum(kind_onehot[..., k, None, None] * fams[k][0] for k in range(6))
    quad = sum(kind_onehot[..., k, None] * fams[k][1] for k in range(6))
    return hp, quad


def packed_interval_normal(ox, oy, dx, dy, hp, quad, want_normal=True):
    """Ray interval + entry normal of a packed section (broadcasting form).

    ox/oy/dx/dy: ray xy origin/dir; hp [..., HP_SLOTS, 3]; quad [..., 3]
    broadcastable against them. Returns (t_lo, t_hi[, nx, ny]); the normal is
    the binding entry constraint's outward direction (unit for halfplanes,
    implicit-gradient for the quadratic — normalize after extruding)."""
    t_lo = jnp.full_like(dx, -BIG)
    t_hi = jnp.full_like(dx, BIG)
    nx = jnp.zeros_like(dx)
    ny = jnp.zeros_like(dx)
    for j in range(HP_SLOTS):
        ux, uy, c = hp[..., j, 0], hp[..., j, 1], hp[..., j, 2]
        lo, hi = _halfplane_interval(ux * ox + uy * oy, ux * dx + uy * dy, c)
        if want_normal:
            dom = lo > t_lo
            nx = jnp.where(dom, ux, nx)
            ny = jnp.where(dom, uy, ny)
        t_lo = jnp.maximum(t_lo, lo)
        t_hi = jnp.minimum(t_hi, hi)
    ia, ib, act = quad[..., 0], quad[..., 1], quad[..., 2]
    qox, qoy, qdx, qdy = ox * ia, oy * ib, dx * ia, dy * ib
    a = jnp.maximum(qdx * qdx + qdy * qdy, EPS)
    b = qox * qdx + qoy * qdy
    cc = qox * qox + qoy * qoy - 1.0
    q_lo, q_hi = _quadratic_interval(a, b, cc)
    q_lo = jnp.where(act > 0.5, q_lo, -BIG)
    q_hi = jnp.where(act > 0.5, q_hi, BIG)
    if want_normal:
        dom = q_lo > t_lo
        nx = jnp.where(dom, (ox + dx * q_lo) * ia * ia, nx)
        ny = jnp.where(dom, (oy + dy * q_lo) * ib * ib, ny)
    t_lo = jnp.maximum(t_lo, q_lo)
    t_hi = jnp.minimum(t_hi, q_hi)
    if want_normal:
        return t_lo, t_hi, nx, ny
    return t_lo, t_hi


def packed_inner_grad(px, py, hp, quad):
    """Signed distance + outward gradient at a point INSIDE a packed section
    (interior-origin shading; see _SECTION_INNER_GRADS). Unit halfplane
    normals make u·p − c a true distance; the quadratic uses the sd_ellipse
    approximation and its analytic gradient."""
    d = jnp.full_like(px, -BIG)
    gx = jnp.zeros_like(px)
    gy = jnp.zeros_like(px)
    for j in range(HP_SLOTS):
        ux, uy, c = hp[..., j, 0], hp[..., j, 1], hp[..., j, 2]
        dk = ux * px + uy * py - c
        dom = dk > d
        gx = jnp.where(dom, ux, gx)
        gy = jnp.where(dom, uy, gy)
        d = jnp.maximum(d, dk)
    ia, ib, act = quad[..., 0], quad[..., 1], quad[..., 2]
    rx, ry = px * ia * ia, py * ib * ib
    k0 = jnp.sqrt((px * ia) ** 2 + (py * ib) ** 2 + 1e-18)
    k1 = jnp.sqrt(rx * rx + ry * ry).clip(1e-9)
    dq = k0 * (k0 - 1.0) / k1
    c1 = (2.0 * k0 - 1.0) / (jnp.maximum(k0, 1e-9) * k1)
    c2 = k0 * (k0 - 1.0) / (k1 * k1 * k1)
    qgx = c1 * rx - c2 * rx * ia * ia
    qgy = c1 * ry - c2 * ry * ib * ib
    dq = jnp.where(act > 0.5, dq, -BIG)
    dom = dq > d
    gx = jnp.where(dom, qgx, gx)
    gy = jnp.where(dom, qgy, gy)
    d = jnp.maximum(d, dq)
    return d, gx, gy


def plug_hit_normal(o, d, kind_onehot, hx, hy, length, t_min=0.0):
    """First-hit t AND exact outward surface normal of the plug prism.

    Returns (t, nx, ny, nz) in the plug local frame; t = BIG on miss, the
    normal is unit-length where t is a real hit (garbage on miss — mask with
    t). The normal is exact for every face (flats AND curved walls): it falls
    out of knowing which constraint bound the entry interval, replacing the
    tetrahedron-FD SDF gradient of the old exact path."""
    ox, oy, dx, dy = o[..., 0], o[..., 1], d[..., 0], d[..., 1]
    s_lo = s_hi = snx = sny = None
    for k, fn in enumerate(_SECTION_INTERVAL_NORMALS):
        lo, hi, nx, ny = fn(ox, oy, dx, dy, hx, hy)
        w = kind_onehot[..., k]
        if s_lo is None:
            s_lo, s_hi = w * lo, w * hi
            snx, sny = w * nx, w * ny
        else:
            s_lo, s_hi = s_lo + w * lo, s_hi + w * hi
            snx, sny = snx + w * nx, sny + w * ny
    z_lo, z_hi = _slab_interval(o[..., 2], d[..., 2], jnp.zeros_like(length), length)
    entry = jnp.maximum(s_lo, z_lo)
    t_in = jnp.maximum(entry, t_min)
    t_out = jnp.minimum(s_hi, z_hi)
    t = jnp.where(t_in <= t_out, t_in, BIG)
    cap = z_lo > s_lo  # the z-slab bound the entry → end-cap face
    z = jnp.zeros_like(s_lo)
    nx = jnp.where(cap, z, snx)
    ny = jnp.where(cap, z, sny)
    nz = jnp.where(cap, -jnp.sign(d[..., 2]), z)
    # interior origins (deep gel indentation): the entry happened behind the
    # origin, so no face bound it — use the nearest-face gradient at the hit
    # point (what the march's FD normal converges to from inside)
    inside = (entry < t_min - 1e-9) & (t_in <= t_out)
    th = jnp.minimum(t_in, 1.0)  # finite eval point even on miss rows
    px, py, pz = (o[..., 0] + d[..., 0] * th, o[..., 1] + d[..., 1] * th,
                  o[..., 2] + d[..., 2] * th)
    d2g = gxg = gyg = None
    for k, fn in enumerate(_SECTION_INNER_GRADS):
        d2k, gxk, gyk = fn(px, py, hx, hy)
        w = kind_onehot[..., k]
        if d2g is None:
            d2g, gxg, gyg = w * d2k, w * gxk, w * gyk
        else:
            d2g, gxg, gyg = d2g + w * d2k, gxg + w * gxk, gyg + w * gyk
    wz = jnp.abs(pz - 0.5 * length) - 0.5 * length
    cap_in = wz > d2g
    nx = jnp.where(inside, jnp.where(cap_in, z, gxg), nx)
    ny = jnp.where(inside, jnp.where(cap_in, z, gyg), ny)
    nz = jnp.where(inside, jnp.where(cap_in, jnp.sign(pz - 0.5 * length), z), nz)
    inv = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-9)
    return t, nx * inv, ny * inv, nz * inv


def section_interval(ox, oy, dx, dy, kind_onehot, hx, hy):
    """One-hot blended section interval (same mixed-batch strategy as
    ops/sdf.section_sdf: compute all six, select — cheaper than branching)."""
    lo_all, hi_all = [], []
    for k in range(len(_SECTION_INTERVALS)):
        lo, hi = _SECTION_INTERVALS[k](ox, oy, dx, dy, hx, hy)
        lo_all.append(lo)
        hi_all.append(hi)
    ko = kind_onehot  # [..., 6] broadcast over pixel axes
    t_lo = sum(ko[..., k] * lo_all[k] for k in range(len(lo_all)))
    t_hi = sum(ko[..., k] * hi_all[k] for k in range(len(hi_all)))
    return t_lo, t_hi


# ------------------------------------------------------------------ solids


def plug_hit(o, d, kind_onehot, hx, hy, length):
    """First-hit t of the plug prism (local frame, z ∈ [0, length]); BIG = miss.

    o, d: [..., 3] ray in the plug frame; shape params broadcast [..., 1]-style.
    """
    s_lo, s_hi = section_interval(o[..., 0], o[..., 1], d[..., 0], d[..., 1],
                                  kind_onehot, hx, hy)
    z_lo, z_hi = _slab_interval(o[..., 2], d[..., 2], jnp.zeros_like(length), length)
    t_in = jnp.maximum(jnp.maximum(s_lo, z_lo), 0.0)
    t_out = jnp.minimum(s_hi, z_hi)
    return jnp.where(t_in <= t_out, t_in, BIG)


def socket_hit(o, d, kind_onehot, hole_hx, hole_hy, height, plate_hx, plate_hy):
    """First-hit t of plate-minus-hole (local frame, plate z ∈ [0, height])."""
    px_lo, px_hi = _slab_interval(o[..., 0], d[..., 0], -plate_hx, plate_hx)
    py_lo, py_hi = _slab_interval(o[..., 1], d[..., 1], -plate_hy, plate_hy)
    pz_lo, pz_hi = _slab_interval(o[..., 2], d[..., 2], jnp.zeros_like(height), height)
    a0 = jnp.maximum(jnp.maximum(jnp.maximum(px_lo, py_lo), pz_lo), 0.0)
    a1 = jnp.minimum(jnp.minimum(px_hi, py_hi), pz_hi)
    h_lo, h_hi = section_interval(o[..., 0], o[..., 1], d[..., 0], d[..., 1],
                                  kind_onehot, hole_hx, hole_hy)
    in_plate = a0 <= a1
    # enter the plate outside the hole prism → hit at a0; enter inside the
    # hole → the ray hits the hole wall where it EXITS the hole prism (if
    # still inside the plate) — a through-hole has no bottom of its own
    entered_in_hole = (a0 >= h_lo - 1e-7) & (a0 <= h_hi + 1e-7)
    wall_t = jnp.where(h_hi <= a1, h_hi, BIG)
    t = jnp.where(entered_in_hole, wall_t, a0)
    return jnp.where(in_plate, t, BIG)


def table_hit(o, d, table_h):
    """Halfspace z ≤ table_h seen from above: hit at z(t) = table_h."""
    dz = d[..., 2]
    t = (table_h - o[..., 2]) / jnp.where(jnp.abs(dz) < EPS, -EPS, dz)
    return jnp.where((dz < -EPS) & (t > 0.0), t, BIG)


def sphere_hit(o, d, center, radius):
    """First-hit t of a sphere (same frame as the ray)."""
    oc = o - center
    b = jnp.sum(oc * d, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    return jnp.where((disc > 0.0) & (t > 0.0), t, BIG)


def capsule_hit(o, d, a, b, radius):
    """First-hit t of a capsule from a to b (infinite-cylinder clamp + caps)."""
    ab = b - a
    ab2 = jnp.sum(ab * ab, -1)
    oa = o - a
    # cylinder: |(p-a) - ((p-a)·û)û| = r with û = ab/|ab|
    d_par = jnp.sum(d * ab, -1) / jnp.sqrt(jnp.maximum(ab2, EPS))
    o_par = jnp.sum(oa * ab, -1) / jnp.sqrt(jnp.maximum(ab2, EPS))
    qa = jnp.sum(d * d, -1) - d_par * d_par
    qb = jnp.sum(oa * d, -1) - o_par * d_par
    qc = jnp.sum(oa * oa, -1) - o_par * o_par - radius * radius
    disc = qb * qb - qa * qc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-qb - sq) / jnp.where(jnp.abs(qa) < EPS, EPS, qa)
    # accept the cylinder hit only between the caps
    h = o_par + d_par * t_cyl
    on_seg = (h >= 0.0) & (h * h <= ab2)
    t_cyl = jnp.where((disc > 0.0) & (t_cyl > 0.0) & on_seg, t_cyl, BIG)
    t = jnp.minimum(t_cyl, jnp.minimum(sphere_hit(o, d, a, radius),
                                       sphere_hit(o, d, b, radius)))
    return t
