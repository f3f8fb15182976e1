"""Closed-form raycaster vs SDF reference implementations.

The exact intersections (sensors/raycast.py) must agree with the analytic
SDFs (ops/sdf.py) they replace in the camera hot path: a reported hit point
lies on the surface (|sdf| ≈ 0) and no earlier surface crossing exists.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.ops import sdf as sdfm
from isaacgyminsertion_tpu.sensors import camera as cam_mod
from isaacgyminsertion_tpu.sensors import raycast as rc

KINDS = [sdfm.KIND_CIRCLE, sdfm.KIND_BOX, sdfm.KIND_HEXAGON,
         sdfm.KIND_ELLIPSE, sdfm.KIND_TRAPEZOID, sdfm.KIND_TRIANGLE]


def _rand_rays(key, n, aim, spread=0.08):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=-0.3, maxval=0.3)
    # origins strictly above the scene so no ray starts inside a solid
    o = o.at[:, 2].set(0.2 + 0.3 * jax.random.uniform(k1, (n,)))
    target = aim + spread * jax.random.normal(k2, (n, 3))
    d = target - o
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_plug_hit_on_surface_all_kinds():
    for kind in KINDS:
        onehot = jnp.zeros((1, 6)).at[0, kind].set(1.0)
        hx = jnp.asarray([0.025])
        hy = jnp.asarray([0.018])
        length = jnp.asarray([0.0762])
        o, d = _rand_rays(jax.random.PRNGKey(kind), 256,
                          jnp.asarray([0.0, 0.0, 0.04]), spread=0.02)
        t = rc.plug_hit(o, d, onehot, hx, hy, length)
        hit = np.asarray(t) < 1.0
        assert hit.sum() > 50, f"kind {kind}: almost no hits"
        pts = o + d * t[:, None]
        dist = np.asarray(sdfm.plug_sdf(pts, onehot, hx, hy, length))[hit]
        assert np.abs(dist).max() < 1e-4, (kind, np.abs(dist).max())
        # no earlier crossing: sample along the ray before the hit
        for frac in (0.25, 0.5, 0.9):
            mid = o + d * (t * frac)[:, None]
            dmid = np.asarray(sdfm.plug_sdf(mid, onehot, hx, hy, length))[hit]
            assert dmid.min() > -1e-5, (kind, frac, dmid.min())


def test_socket_hit_on_surface_all_kinds():
    plate_hx, plate_hy = jnp.asarray(0.06), jnp.asarray(0.05)
    for kind in KINDS:
        onehot = jnp.zeros((1, 6)).at[0, kind].set(1.0)
        hhx, hhy = jnp.asarray([0.026]), jnp.asarray([0.019])
        height = jnp.asarray([0.01])
        o, d = _rand_rays(jax.random.PRNGKey(10 + kind), 512,
                          jnp.asarray([0.0, 0.0, 0.005]), spread=0.05)
        t = rc.socket_hit(o, d, onehot, hhx, hhy, height, plate_hx, plate_hy)
        hit = np.asarray(t) < 1.0
        assert hit.sum() > 50, f"kind {kind}: almost no hits"
        pts = o + d * t[:, None]
        dist = np.asarray(sdfm.socket_sdf(pts, onehot, hhx, hhy, height,
                                          plate_hx, plate_hy))[hit]
        assert np.abs(dist).max() < 1e-4, (kind, np.abs(dist).max())
        for frac in (0.3, 0.7, 0.95):
            mid = o + d * (t * frac)[:, None]
            dmid = np.asarray(sdfm.socket_sdf(mid, onehot, hhx, hhy, height,
                                              plate_hx, plate_hy))[hit]
            assert dmid.min() > -1e-5, (kind, frac, dmid.min())


def test_capsule_and_sphere_hits():
    o = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t = rc.sphere_hit(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), 0.1)
    assert np.isclose(float(t[0]), 0.9, atol=1e-6)
    # vertical capsule: ray down its axis hits the top cap
    t = rc.capsule_hit(o, d, jnp.asarray([[0.0, 0.0, 0.0]]),
                       jnp.asarray([[0.0, 0.0, 0.5]]), 0.05)
    assert np.isclose(float(t[0]), 0.45, atol=1e-6)
    # ray from the side hits the cylinder wall
    t = rc.capsule_hit(jnp.asarray([[1.0, 0.0, 0.25]]),
                       jnp.asarray([[-1.0, 0.0, 0.0]]),
                       jnp.asarray([[0.0, 0.0, 0.0]]),
                       jnp.asarray([[0.0, 0.0, 0.5]]), 0.05)
    assert np.isclose(float(t[0]), 0.95, atol=1e-5)


def test_camera_exact_matches_march():
    """Full-camera parity: exact vs SDF-march depth/seg on a mixed batch."""
    from isaacgyminsertion_tpu.assets import build_subassembly_set

    SUBS = build_subassembly_set()
    N = len(SUBS.names)
    sub_idx = jnp.arange(N)
    g = lambda a: jnp.asarray(a)[sub_idx]
    ccfg = cam_mod.CameraConfig()
    plug_pos = jnp.tile(jnp.asarray([0.5, 0.0, 0.05]), (N, 1))
    plug_q = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (N, 1))
    sock_pos = jnp.tile(jnp.asarray([0.5, 0.0, 0.001]), (N, 1))
    args = (plug_q, plug_pos, plug_q, sock_pos, g(SUBS.kind_onehot),
            g(SUBS.plug_hx), g(SUBS.plug_hy), g(SUBS.plug_length),
            g(SUBS.hole_hx), g(SUBS.hole_hy), g(SUBS.socket_height),
            jnp.full((N,), 0.001))
    _, seg_e, raw_e = cam_mod.render_depth_seg(ccfg, *args, method="exact")
    _, seg_m, raw_m = cam_mod.render_depth_seg(ccfg, *args, method="march",
                                               fused=False)
    raw_e, raw_m = np.asarray(raw_e), np.asarray(raw_m)
    seg_e, seg_m = np.asarray(seg_e), np.asarray(seg_m)
    # depth compared where the component agrees. The march carries a known
    # FORWARD bias: it keeps stepping its 1e-4 minimum after reaching the
    # surface, overshooting by up to (march_iters × 1e-4); the exact hit has
    # no such bias. Require march ≥ exact (march never stops short of the
    # true surface by more than its convergence) and bounded overshoot.
    both = (raw_e < ccfg.far - 1e-3) & (raw_m < ccfg.far - 1e-3) & (seg_e == seg_m)
    assert both.mean() > 0.5
    diff = raw_m[both] - raw_e[both]
    bias_bound = ccfg.march_iters * 1e-4 + 2e-3
    assert np.median(diff) > -5e-4, np.median(diff)
    assert np.quantile(diff, 0.95) < bias_bound, np.quantile(diff, 0.95)
    # seg: identical on ≥95% of pixels (the rest are silhouette boundaries)
    agree = (seg_e == seg_m).mean()
    assert agree > 0.95, agree
    for sid in (cam_mod.SEG_PLUG, cam_mod.SEG_SOCKET):
        assert (seg_e == sid).sum() > 20


def test_plug_hit_normal_matches_sdf_gradient_all_kinds():
    """plug_hit_normal's interval-derived normal equals the SDF gradient at
    the hit point (away from edges/corners, where the gradient is smooth)."""
    for kind in KINDS:
        onehot = jnp.zeros((1, 6)).at[0, kind].set(1.0)
        hx = jnp.asarray([0.025])
        hy = jnp.asarray([0.018])
        length = jnp.asarray([0.0762])
        o, d = _rand_rays(jax.random.PRNGKey(100 + kind), 512,
                          jnp.asarray([0.0, 0.0, 0.04]), spread=0.02)
        t, nx, ny, nz = rc.plug_hit_normal(o, d, onehot, hx, hy, length)
        t2 = rc.plug_hit(o, d, onehot, hx, hy, length)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), rtol=1e-6)
        hit = np.asarray(t) < 1.0
        assert hit.sum() > 50
        pts = o + d * jnp.minimum(t, 1.0)[:, None]
        g = jax.vmap(jax.grad(
            lambda p: sdfm.plug_sdf(p[None], onehot, hx, hy, length)[0]))(pts)
        g = np.asarray(g / jnp.linalg.norm(g, axis=-1, keepdims=True).clip(1e-9))
        n = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], -1)
        dot = (n * g).sum(-1)[hit]
        # edges/corners: the interval normal picks one adjoining face while
        # the SDF gradient blends — exclude by requiring 97% strong agreement
        assert (dot > 0.99).mean() > 0.97, (kind, (dot > 0.99).mean())
        assert np.abs(np.linalg.norm(n[hit], axis=-1) - 1.0).max() < 1e-5


def test_plug_hit_normal_interior_origins():
    """Rays that START inside the prism (deep gel indentation): the returned
    normal must be the nearest-face SDF gradient at the origin, not a stale
    entry-face pick (regression: env-deep tactile frames shaded wrong)."""
    for kind in KINDS:
        onehot = jnp.zeros((1, 6)).at[0, kind].set(1.0)
        hx = jnp.asarray([0.025])
        hy = jnp.asarray([0.018])
        length = jnp.asarray([0.0762])
        key = jax.random.PRNGKey(200 + kind)
        k1, k2 = jax.random.split(key)
        # origins sampled inside the core of the prism
        o = jax.random.uniform(k1, (256, 3), minval=-0.012, maxval=0.012)
        o = o.at[:, 2].set(0.015 + 0.045 * jax.random.uniform(k1, (256,)))
        d = jax.random.normal(k2, (256, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        ins = np.asarray(sdfm.plug_sdf(o, onehot, hx, hy, length)) < -1e-3
        assert ins.sum() > 30, (kind, ins.sum())
        t, nx, ny, nz = rc.plug_hit_normal(o, d, onehot, hx, hy, length,
                                           t_min=1e-3)
        # interior rays hit at t_min
        np.testing.assert_allclose(np.asarray(t)[ins], 1e-3, rtol=1e-5)
        pts = o + d * jnp.minimum(t, 1.0)[:, None]
        g = jax.vmap(jax.grad(
            lambda p: sdfm.plug_sdf(p[None], onehot, hx, hy, length)[0]))(pts)
        g = np.asarray(g / jnp.linalg.norm(g, axis=-1, keepdims=True).clip(1e-9))
        n = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], -1)
        dot = (n * g).sum(-1)[ins]
        # interior gradient is piecewise-constant per nearest face; near the
        # medial axis the argmax face can legitimately flip vs the smooth
        # blend — require strong agreement away from it
        assert (dot > 0.97).mean() > 0.9, (kind, (dot > 0.97).mean())


def test_packed_section_matches_family_math():
    """The packed halfplane+quadratic form (section_halfplanes +
    packed_interval_normal / packed_inner_grad) reproduces the per-family
    interval, entry-normal, and interior-gradient math on a mixed batch."""
    rng = np.random.default_rng(7)
    n = 384
    kinds = rng.integers(0, 6, n)
    onehot = jnp.eye(6)[kinds]
    hx = jnp.asarray(rng.uniform(0.008, 0.03, n), jnp.float32)
    hy = jnp.asarray(rng.uniform(0.008, 0.03, n), jnp.float32)
    ox = jnp.asarray(rng.uniform(-0.08, 0.08, n), jnp.float32)
    oy = jnp.asarray(rng.uniform(-0.08, 0.08, n), jnp.float32)
    th = rng.uniform(0, 2 * np.pi, n)
    dx = jnp.asarray(np.cos(th), jnp.float32)
    dy = jnp.asarray(np.sin(th), jnp.float32)

    hp, quad = rc.section_halfplanes(onehot, hx, hy)
    lo_p, hi_p, nx_p, ny_p = rc.packed_interval_normal(ox, oy, dx, dy, hp, quad)
    lo_r, hi_r = rc.section_interval(ox, oy, dx, dy, onehot, hx, hy)

    # intervals agree where the section is actually hit (misses may differ in
    # their ±BIG bookkeeping)
    hit = (np.asarray(lo_r) <= np.asarray(hi_r)) & (np.abs(np.asarray(lo_r)) < 1.0)
    assert hit.sum() > 100
    np.testing.assert_allclose(np.asarray(lo_p)[hit], np.asarray(lo_r)[hit],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.minimum(hi_p, 10.0))[hit],
        np.asarray(jnp.minimum(hi_r, 10.0))[hit], rtol=1e-4, atol=1e-6)

    # entry normals agree (directions; packed magnitudes family-dependent)
    s_lo = s_hi = snx = sny = None
    for k, fn in enumerate(rc._SECTION_INTERVAL_NORMALS):
        lo, hi, nx, ny = fn(ox, oy, dx, dy, hx, hy)
        w = onehot[..., k]
        if s_lo is None:
            s_lo, snx, sny = w * lo, w * nx, w * ny
        else:
            s_lo, snx, sny = s_lo + w * lo, snx + w * nx, sny + w * ny
    norm = lambda x, y: (np.asarray(x / jnp.sqrt(x * x + y * y + 1e-18)),
                         np.asarray(y / jnp.sqrt(x * x + y * y + 1e-18)))
    ax, ay = norm(nx_p, ny_p)
    bx, by = norm(snx, sny)
    dots = (ax * bx + ay * by)[hit]
    assert (dots > 0.9999).mean() > 0.98, (dots.min(), (dots > 0.9999).mean())

    # interior distance+gradient parity on points inside
    pxi = jnp.asarray(rng.uniform(-0.02, 0.02, n), jnp.float32) * 0.5
    pyi = jnp.asarray(rng.uniform(-0.02, 0.02, n), jnp.float32) * 0.5
    d_p, gx_p, gy_p = rc.packed_inner_grad(pxi, pyi, hp, quad)
    d_r = gx_r = gy_r = None
    for k, fn in enumerate(rc._SECTION_INNER_GRADS):
        dk, gxk, gyk = fn(pxi, pyi, hx, hy)
        w = onehot[..., k]
        if d_r is None:
            d_r, gx_r, gy_r = w * dk, w * gxk, w * gyk
        else:
            d_r, gx_r, gy_r = d_r + w * dk, gx_r + w * gxk, gy_r + w * gyk
    inside = np.asarray(d_r) < -1e-4
    assert inside.sum() > 100
    np.testing.assert_allclose(np.asarray(d_p)[inside], np.asarray(d_r)[inside],
                               rtol=1e-3, atol=1e-5)
    ax, ay = norm(gx_p, gy_p)
    bx, by = norm(gx_r, gy_r)
    dots = (ax * bx + ay * by)[inside]
    assert (dots > 0.999).mean() > 0.97, (dots.min(), (dots > 0.999).mean())
