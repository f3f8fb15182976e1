"""Fused Pallas ray-march renderers — the hot kernels of the sensor stack.

The XLA marchers (sensors/tactile.py, sensors/camera.py) run their
fixed-trip sphere-trace as a `lax.scan`, so every iteration round-trips
[N, F, H, W]-sized ray state through HBM, and the [N, F, H, W, 3] ray
directions are materialized up front (~150 MB at 1024 envs). These kernels
keep a block of rays resident in VMEM: per-(env, finger) camera rotations
ride in as scalar planes, ray directions are reconstructed in-register from
the constant pixel grid, and ALL march iterations + SDF family blends +
normals + shading run without touching HBM — one scalar-plane read, one
image write.

Replaces (reference): the TACTO/pyrender EGL per-finger CPU loop
(allsight/tacto/renderer.py, factory_task_insertion.py:479-583) and the
IsaacGym camera sensors (factory_env_insertion.py:940-1003) — see
sensors/tactile.py / sensors/camera.py for the semantic parity map; this
module is their TPU execution engine (parity tests:
tests/test_render_pallas.py, interpret mode off-TPU).

Layout: pixels on the 128-lane axis (tactile 64×64 = 4096 = 32 lanes-rows;
camera 54×96 = 5184 padded to 5248), one (env, finger) per sublane row,
BLOCK_R rows per program.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK_R = 8


def _block_r(override: int | None = None) -> int:
    """Rows per program. Overridable per-call or via IGT_RENDER_BLOCK_R for
    on-chip autotuning (tools/autotune_render.py); output is identical for
    any value — it only changes the grid/VMEM tiling."""
    if override is not None:
        return int(override)
    return int(os.environ.get("IGT_RENDER_BLOCK_R", BLOCK_R))


def _max_rows() -> int:
    """Row cap per pallas_call; bigger batches are chunked by the fused
    wrappers (round-4 chip postmortem: 24,576 un-gathered rows Mosaic-OOMed
    at 17.72 MB scoped VMEM vs the 16 MB limit). Output is identical —
    chunks are independent grid row-ranges."""
    return int(os.environ.get("IGT_RENDER_MAX_ROWS", 16384))


def _pad_axis(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ------------------------------------------------------------------ plane SDFs
# The plane-form SDF family lives in ops/sdf.py (shared with batched contact
# generation); these aliases keep the kernel code unchanged. Formulas are
# identical to the vector forms (incl. the gradient-safe epsilons) —
# ops/sdf.py's vector form is the oracle in the parity tests.

from ..ops.sdf import (  # noqa: E402
    plane_sd_box2d as _sd_box2d,
    plug_sdf_planes as _plug_sdf_planes,
    socket_sdf_planes as _socket_sdf_planes,
)


# tetrahedron finite-difference directions for SDF normals
_TET = ((1.0, -1.0, -1.0), (-1.0, -1.0, 1.0), (-1.0, 1.0, -1.0), (1.0, 1.0, 1.0))
_FD_EPS = 2.0e-5

# 3 RGB lights (sensors/tactile.py _light_dirs/_LIGHT_COLORS)
_LIGHTS = (
    (0.7, 0.0, 0.714, 1.0, 0.25, 0.25),
    (-0.35, 0.6062177826491071, 0.714, 0.25, 1.0, 0.25),
    (-0.35, -0.6062177826491071, 0.714, 0.25, 0.25, 1.0),
)


def _tactile_kernel(scal, rays, mask, seed, r_out, g_out, b_out, *,
                    iters: int, max_range: float, max_deformation: float,
                    force_range: float, t0: float, exact: bool = False,
                    noise_std: float = 0.0, glow: float = 0.0,
                    clip_out: bool = True, noise_kind: str = "gauss"):
    S = scal[...]
    c = lambda i: S[:, i:i + 1]
    m = [c(i) for i in range(9)]                     # camera→plug rotation
    ox, oy, oz = c(9), c(10), c(11)
    oh = tuple(c(12 + k) for k in range(6))
    hx, hy, length = c(18), c(19), c(20)
    force = c(21)
    # packed section (raycast.section_halfplanes): 6 halfplanes + quadratic
    hp = [(c(22 + 3 * j), c(23 + 3 * j), c(24 + 3 * j)) for j in range(6)]
    qia, qib, qact = c(40), c(41), c(42)

    R = rays[...]                                    # [3, P]
    rx, ry, rz = R[0:1, :], R[1:2, :], R[2:3, :]
    dx = m[0] * rx + m[1] * ry + m[2] * rz           # [B, P]
    dy = m[3] * rx + m[4] * ry + m[5] * rz
    dz = m[6] * rx + m[7] * ry + m[8] * rz

    def sdf(px, py, pz):
        return _plug_sdf_planes(px, py, pz, oh, hx, hy, length)

    if exact:
        # closed-form first hit + entry-face normal on the PACKED section
        # (raycast.section_halfplanes): one constraint sweep replaces the
        # six-family one-hot evaluation — the section math dominated per-ray
        # cost; normals fall out of which constraint bound the entry (no SDF
        # gradient evals — the tet-FD loop was ~65% of per-ray flops)
        from . import raycast as rc

        s_lo = jnp.full_like(dx, -rc.BIG)
        s_hi = jnp.full_like(dx, rc.BIG)
        snx = jnp.zeros_like(dx)
        sny = jnp.zeros_like(dx)
        for ux, uy, cc in hp:
            lo, hi = rc._halfplane_interval(ux * ox + uy * oy,
                                            ux * dx + uy * dy, cc)
            dom = lo > s_lo
            snx = jnp.where(dom, ux, snx)
            sny = jnp.where(dom, uy, sny)
            s_lo = jnp.maximum(s_lo, lo)
            s_hi = jnp.minimum(s_hi, hi)
        qox, qoy = ox * qia, oy * qib
        qdx, qdy = dx * qia, dy * qib
        qa = jnp.maximum(qdx * qdx + qdy * qdy, 1e-9)
        qb = qox * qdx + qoy * qdy
        qc = qox * qox + qoy * qoy - 1.0
        q_lo, q_hi = rc._quadratic_interval(qa, qb, qc)
        q_lo = jnp.where(qact > 0.5, q_lo, -rc.BIG)
        q_hi = jnp.where(qact > 0.5, q_hi, rc.BIG)
        dom = q_lo > s_lo
        snx = jnp.where(dom, (ox + dx * q_lo) * qia * qia, snx)
        sny = jnp.where(dom, (oy + dy * q_lo) * qib * qib, sny)
        s_lo = jnp.maximum(s_lo, q_lo)
        s_hi = jnp.minimum(s_hi, q_hi)
        z_lo, z_hi = rc._slab_interval(oz, dz, jnp.zeros_like(length), length)
        entry = jnp.maximum(s_lo, z_lo)
        t_in = jnp.maximum(entry, t0)
        t_out = jnp.minimum(s_hi, z_hi)
        t = jnp.where(t_in <= t_out, jnp.minimum(t_in, max_range), max_range)
        d_final = jnp.where(t < max_range - 1e-6, 0.0, 1.0)
        cap = z_lo > s_lo
        zz = jnp.zeros_like(s_lo)
        nx = jnp.where(cap, zz, snx)
        ny = jnp.where(cap, zz, sny)
        nz = jnp.where(cap, -jnp.sign(dz), zz)
        # interior origins (deep indentation): no entry face — use the
        # nearest-face gradient at the hit point (raycast.packed_inner_grad)
        inside = (entry < t0 - 1e-9) & (t_in <= t_out)
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        d2g = jnp.full_like(dx, -rc.BIG)
        gxg = jnp.zeros_like(dx)
        gyg = jnp.zeros_like(dx)
        for ux, uy, cc in hp:
            dk = ux * px + uy * py - cc
            dom = dk > d2g
            gxg = jnp.where(dom, ux, gxg)
            gyg = jnp.where(dom, uy, gyg)
            d2g = jnp.maximum(d2g, dk)
        rxq, ryq = px * qia * qia, py * qib * qib
        k0 = jnp.sqrt((px * qia) ** 2 + (py * qib) ** 2 + 1e-18)
        k1 = jnp.maximum(jnp.sqrt(rxq * rxq + ryq * ryq), 1e-9)
        dq = k0 * (k0 - 1.0) / k1
        c1 = (2.0 * k0 - 1.0) / (jnp.maximum(k0, 1e-9) * k1)
        c2 = k0 * (k0 - 1.0) / (k1 * k1 * k1)
        dq = jnp.where(qact > 0.5, dq, -rc.BIG)
        dom = dq > d2g
        gxg = jnp.where(dom, c1 * rxq - c2 * rxq * qia * qia, gxg)
        gyg = jnp.where(dom, c1 * ryq - c2 * ryq * qib * qib, gyg)
        d2g = jnp.maximum(d2g, dq)
        wz = jnp.abs(pz - 0.5 * length) - 0.5 * length
        cap_in = wz > d2g
        nx = jnp.where(inside, jnp.where(cap_in, zz, gxg), nx)
        ny = jnp.where(inside, jnp.where(cap_in, zz, gyg), ny)
        nz = jnp.where(inside, jnp.where(cap_in, jnp.sign(pz - 0.5 * length), zz), nz)
    else:
        t = jnp.full(dx.shape, t0, dx.dtype)
        for _ in range(iters):
            d = sdf(ox + dx * t, oy + dy * t, oz + dz * t)
            t = jnp.minimum(t + jnp.maximum(d, 1e-4), max_range)

        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        d_final = sdf(px, py, pz)
        # tetrahedron FD normal (plug frame)
        nx = jnp.zeros_like(d_final)
        ny = jnp.zeros_like(d_final)
        nz = jnp.zeros_like(d_final)
        for ex, ey, ez in _TET:
            dd = sdf(px + _FD_EPS * ex, py + _FD_EPS * ey, pz + _FD_EPS * ez)
            nx = nx + ex * dd
            ny = ny + ey * dd
            nz = nz + ez * dd
    inv = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-9)
    nx, ny, nz = nx * inv, ny * inv, nz * inv

    hit = ((d_final < 2e-3) & (t < max_range - 1e-4)).astype(t.dtype)
    indent = max_deformation * jnp.clip(force / force_range, 0.0, 1.0)
    height = jnp.clip(1.0 - (t - indent) / max_range, 0.0, 1.0) * hit

    # normal back to camera frame: n_c = Mᵀ n_p
    ncx = m[0] * nx + m[3] * ny + m[6] * nz
    ncy = m[1] * nx + m[4] * ny + m[7] * nz
    ncz = m[2] * nx + m[5] * ny + m[8] * nz
    r = jnp.zeros_like(height)
    g = jnp.zeros_like(height)
    b = jnp.zeros_like(height)
    for lx, ly, lz, cr, cg, cb in _LIGHTS:
        lam = jnp.clip(-(ncx * lx + ncy * ly + ncz * lz), 0.0, 1.0)
        r = r + lam * cr
        g = g + lam * cg
        b = b + lam * cb
    # fused epilogue (tactile._tactile_epilogue): circular gel mask, static
    # background glow, gaussian pixel noise, clip — saves 3-4 full-image HBM
    # traversals at the step level
    msk = mask[...]                                  # [1, HW] → broadcast
    hm = height * msk
    r, g, b = r * hm + glow * msk, g * hm + glow * msk, b * hm + glow * msk
    if noise_std > 0.0:
        pltpu.prng_seed(seed[0], pl.program_id(0))

        def u24(shape):
            # prng_random_bits returns SIGNED int32 on TPU hardware (observed:
            # 50% negative); a plain `>> 8` is an arithmetic shift that keeps
            # the sign and fed negative "uniforms" into log() → NaN on chip
            # only (interpret mode never runs this path). Masking the low 24
            # bits after the shift selects bits [8,32) — uniform in [0, 2^24).
            bits = pltpu.prng_random_bits(shape)
            return ((bits >> 8) & 0xFFFFFF).astype(r.dtype) * (2.0 ** -24)

        if noise_kind == "ih4":
            # Irwin-Hall(4): sum of 4 uniforms, recentered/rescaled to unit
            # variance — transcendental-free (Box-Muller's log/sqrt/cos/sin
            # are multi-cycle VPU ops). Tails bounded at ±3.46σ; fine for
            # px-level DR noise, opt-in via IGT_TACTILE_NOISE=ih4.
            def gauss():
                s = jnp.zeros_like(r)
                for _ in range(4):
                    s = s + u24(r.shape)
                return (s - 2.0) * 1.7320508075688772

            g1, g2, g3 = gauss(), gauss(), gauss()
        else:
            def gauss_pair():
                u1 = u24(r.shape) + 1e-7
                u2 = u24(r.shape)
                rad = jnp.sqrt(-2.0 * jnp.log(u1))
                ang = (2.0 * 3.141592653589793) * u2
                return rad * jnp.cos(ang), rad * jnp.sin(ang)

            g1, g2 = gauss_pair()
            g3, _ = gauss_pair()
        r = r + noise_std * g1
        g = g + noise_std * g2
        b = b + noise_std * g3
    if clip_out:
        r = jnp.clip(r, 0.0, 1.0)
        g = jnp.clip(g, 0.0, 1.0)
        b = jnp.clip(b, 0.0, 1.0)
    r_out[...] = r
    g_out[...] = g
    b_out[...] = b


def tactile_march_fused(
    M: jax.Array,       # [R, 3, 3] camera→plug rotations (R = N*F rows)
    o: jax.Array,       # [R, 3] ray origin in the plug frame
    kind_onehot: jax.Array,  # [R, 6]
    hx: jax.Array, hy: jax.Array, length: jax.Array, force: jax.Array,  # [R]
    rays_c: jax.Array,  # [HW, 3] constant pixel ray dirs (camera frame)
    iters: int, max_range: float, max_deformation: float, force_range: float,
    t0: float = 1e-3,
    interpret: bool | None = None,
    exact: bool = False,
    mask_flat: jax.Array | None = None,  # [HW] gel mask (1 inside, 0 outside)
    noise_key: jax.Array | None = None,
    noise_std: float = 0.0,
    glow: float = 0.0,
    block_r: int | None = None,
    noise_kind: str | None = None,
) -> jax.Array:
    """Returns FINAL RGB planes [R, HW, 3] (mask, glow, noise, clip fused).

    `exact=True` replaces the march loop with the closed-form prism
    intersection (sensors/raycast.py planes form) inside the same VMEM
    kernel — fewer flops, identical output contract. The epilogue
    (tactile._tactile_epilogue pixel ops) runs inside the kernel; gaussian
    noise uses the TPU hardware PRNG (pltpu.prng_random_bits), falling back
    to XLA threefry under interpret mode where that primitive is missing."""
    rr, hw = M.shape[0], rays_c.shape[0]
    assert hw % LANE == 0, "pad pixel count to a lane multiple"
    max_rows = _max_rows()
    if rr > max_rows:
        # Row-chunk oversized batches (round-4 chip postmortem: a 24,576-row
        # un-gathered call Mosaic-OOMed at 17.72 MB scoped VMEM vs the 16 MB
        # limit; the production render-on-demand path gathers to ≤ capacity
        # rows and never hits this, but tools and ungated callers can).
        # Identical output: each chunk is an independent grid row-range.
        outs = []
        for s in range(0, rr, max_rows):
            e = min(s + max_rows, rr)
            nk = None if noise_key is None else jax.random.fold_in(noise_key, s)
            outs.append(tactile_march_fused(
                M[s:e], o[s:e], kind_onehot[s:e], hx[s:e], hy[s:e],
                length[s:e], force[s:e], rays_c, iters, max_range,
                max_deformation, force_range, t0=t0, interpret=interpret,
                exact=exact, mask_flat=mask_flat, noise_key=nk,
                noise_std=noise_std, glow=glow, block_r=block_r,
                noise_kind=noise_kind))
        return jnp.concatenate(outs, axis=0)
    br = _block_r(block_r)
    r_pad = ((rr + br - 1) // br) * br

    from . import raycast as rc

    hp, quad = rc.section_halfplanes(kind_onehot, hx, hy)
    scal = jnp.concatenate(
        [
            M.reshape(rr, 9), o, kind_onehot,
            hx[:, None], hy[:, None], length[:, None], force[:, None],
            hp.reshape(rr, 3 * rc.HP_SLOTS), quad,
            jnp.zeros((rr, LANE - 43), M.dtype),
        ],
        axis=1,
    )
    scal = _pad_axis(scal, r_pad, axis=0)
    # padded rows need nonzero shape params to avoid 0/0 in the ellipse SDF
    if r_pad > rr:
        scal = scal.at[rr:, 18:21].set(1.0)
    rays = rays_c.T  # [3, HW]

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    if mask_flat is None:
        mask_flat = jnp.ones((hw,), M.dtype)
    mask = mask_flat.astype(M.dtype)[None, :]        # [1, HW]
    want_noise = noise_key is not None and noise_std > 0.0
    in_kernel_noise = want_noise and not interpret
    if in_kernel_noise:
        seed = jax.random.key_data(noise_key).reshape(-1)[:1].astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    if noise_kind is None:
        noise_kind = os.environ.get("IGT_TACTILE_NOISE", "gauss")
    grid = (r_pad // br,)
    kernel = functools.partial(
        _tactile_kernel, iters=iters, max_range=max_range,
        max_deformation=max_deformation, force_range=force_range, t0=t0,
        exact=exact, glow=glow,
        noise_std=noise_std if in_kernel_noise else 0.0,
        clip_out=not (want_noise and not in_kernel_noise),
        noise_kind=noise_kind,
    )
    plane = pl.BlockSpec((br, hw), lambda i: (i, 0))
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, LANE), lambda i: (i, 0)),
            pl.BlockSpec((3, hw), lambda i: (0, 0)),
            pl.BlockSpec((1, hw), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[plane] * 3,
        out_shape=[jax.ShapeDtypeStruct((r_pad, hw), M.dtype)] * 3,
        interpret=interpret,
    )(scal, rays, mask, seed)
    img = jnp.stack([r[:rr], g[:rr], b[:rr]], axis=-1)
    if want_noise and not in_kernel_noise:
        img = img + noise_std * jax.random.normal(noise_key, img.shape)
        img = jnp.clip(img, 0.0, 1.0)
    return img


def _camera_kernel(scal, rays, t_out, dmin_out, comp_out, *, iters: int,
                   near: float, far: float, plate_hx: float, plate_hy: float,
                   tip_radius: float, hand_radius: float, exact: bool = False):
    S = scal[...]
    c = lambda i: S[:, i:i + 1]
    mp = [c(i) for i in range(9)]            # camera→plug rotation
    opx, opy, opz = c(9), c(10), c(11)
    ms = [c(12 + i) for i in range(9)]       # camera→socket rotation
    osx, osy, osz = c(21), c(22), c(23)
    wz0, wz1, wz2 = c(24), c(25), c(26)      # world-z row of the camera rot
    cam_z = c(27)
    oh = tuple(c(28 + k) for k in range(6))
    phx, phy, plen = c(34), c(35), c(36)
    hhx, hhy, sheight = c(37), c(38), c(39)
    table_h = c(40)
    # robot proxy geometry in CAMERA frame (ray origin = 0): 3 fingertip
    # spheres + wrist→hand capsule (factory_env_insertion.py:940-1003 —
    # the hand enters the external camera's 0.5 m frustum during descent)
    tips = [(c(41 + 3 * i), c(42 + 3 * i), c(43 + 3 * i)) for i in range(3)]
    ax, ay, az = c(50), c(51), c(52)         # capsule end a (wrist)
    bx, by, bz = c(53), c(54), c(55)         # capsule end b (hand)
    # packed sections (raycast.section_halfplanes): plug then socket hole
    hp_p = [(c(56 + 3 * j), c(57 + 3 * j), c(58 + 3 * j)) for j in range(6)]
    quad_p = (c(74), c(75), c(76))
    hp_h = [(c(77 + 3 * j), c(78 + 3 * j), c(79 + 3 * j)) for j in range(6)]
    quad_h = (c(95), c(96), c(97))
    abx, aby, abz = bx - ax, by - ay, bz - az
    ab2 = abx * abx + aby * aby + abz * abz + 1e-9

    R = rays[...]
    rx, ry, rz = R[0:1, :], R[1:2, :], R[2:3, :]
    dpx = mp[0] * rx + mp[1] * ry + mp[2] * rz
    dpy = mp[3] * rx + mp[4] * ry + mp[5] * rz
    dpz = mp[6] * rx + mp[7] * ry + mp[8] * rz
    dsx = ms[0] * rx + ms[1] * ry + ms[2] * rz
    dsy = ms[3] * rx + ms[4] * ry + ms[5] * rz
    dsz = ms[6] * rx + ms[7] * ry + ms[8] * rz
    dwz = wz0 * rx + wz1 * ry + wz2 * rz     # world-frame ray z component

    def kuka_sdf(t):
        px, py, pz = rx * t, ry * t, rz * t  # camera-frame point on the ray
        d = None
        for tx, ty, tz in tips:
            dx, dy, dz = px - tx, py - ty, pz - tz
            ds_ = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-12) - tip_radius
            d = ds_ if d is None else jnp.minimum(d, ds_)
        qx, qy, qz = px - ax, py - ay, pz - az
        h = jnp.clip((qx * abx + qy * aby + qz * abz) / ab2, 0.0, 1.0)
        cx, cy, cz = qx - h * abx, qy - h * aby, qz - h * abz
        dcap = jnp.sqrt(cx * cx + cy * cy + cz * cz + 1e-12) - hand_radius
        return jnp.minimum(d, dcap)

    if exact:
        # closed-form first hits (sensors/raycast.py in planes form) — the
        # whole scene is analytic: plug prism, plate-minus-hole CSG, table
        # halfspace, robot proxy spheres+capsule. Replaces the `iters`-trip
        # march with ~1 interval evaluation per component; exact depths.
        from . import raycast as rc

        def packed_iv(ox_, oy_, dx_, dy_, hps, quad):
            lo_a = jnp.full_like(dx_, -rc.BIG)
            hi_a = jnp.full_like(dx_, rc.BIG)
            for ux, uy, cc in hps:
                lo, hi = rc._halfplane_interval(ux * ox_ + uy * oy_,
                                                ux * dx_ + uy * dy_, cc)
                lo_a = jnp.maximum(lo_a, lo)
                hi_a = jnp.minimum(hi_a, hi)
            qia, qib, qact = quad
            qox, qoy = ox_ * qia, oy_ * qib
            qdx, qdy = dx_ * qia, dy_ * qib
            qa = jnp.maximum(qdx * qdx + qdy * qdy, 1e-9)
            qb = qox * qdx + qoy * qdy
            qc = qox * qox + qoy * qoy - 1.0
            q_lo, q_hi = rc._quadratic_interval(qa, qb, qc)
            lo_a = jnp.maximum(lo_a, jnp.where(qact > 0.5, q_lo, -rc.BIG))
            hi_a = jnp.minimum(hi_a, jnp.where(qact > 0.5, q_hi, rc.BIG))
            return lo_a, hi_a

        # plug prism (plug frame) and socket hole section (socket frame)
        p_lo, p_hi = packed_iv(opx, opy, dpx, dpy, hp_p, quad_p)
        h_lo, h_hi = packed_iv(osx, osy, dsx, dsy, hp_h, quad_h)
        z_lo, z_hi = rc._slab_interval(opz, dpz, jnp.zeros_like(plen), plen)
        t_in = jnp.maximum(jnp.maximum(p_lo, z_lo), 0.0)
        t_p = jnp.where(t_in <= jnp.minimum(p_hi, z_hi), t_in, rc.BIG)
        # socket plate-minus-hole (socket frame; raycast.socket_hit logic)
        px_lo, px_hi = rc._slab_interval(osx, dsx, -plate_hx, plate_hx)
        py_lo, py_hi = rc._slab_interval(osy, dsy, -plate_hy, plate_hy)
        pz_lo, pz_hi = rc._slab_interval(osz, dsz, jnp.zeros_like(sheight), sheight)
        a0 = jnp.maximum(jnp.maximum(jnp.maximum(px_lo, py_lo), pz_lo), 0.0)
        a1 = jnp.minimum(jnp.minimum(px_hi, py_hi), pz_hi)
        entered_in_hole = (a0 >= h_lo - 1e-7) & (a0 <= h_hi + 1e-7)
        wall_t = jnp.where(h_hi <= a1, h_hi, rc.BIG)
        t_s = jnp.where(a0 <= a1,
                        jnp.where(entered_in_hole, wall_t, a0), rc.BIG)
        # table halfspace seen from above (raycast.table_hit)
        t_t = (table_h - cam_z) / jnp.where(jnp.abs(dwz) < 1e-9, -1e-9, dwz)
        t_t = jnp.where((dwz < -1e-9) & (t_t > 0.0), t_t, rc.BIG)
        # robot proxies (camera frame, ray origin 0; |d| = 1)
        def sphere0(cx, cy, cz, radius):
            b = -(cx * rx + cy * ry + cz * rz)
            cc = cx * cx + cy * cy + cz * cz - radius * radius
            disc = b * b - cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            th = -b - sq
            return jnp.where((disc > 0.0) & (th > 0.0), th, rc.BIG)

        t_k = sphere0(ax, ay, az, hand_radius)
        t_k = jnp.minimum(t_k, sphere0(bx, by, bz, hand_radius))
        for tx, ty, tz in tips:
            t_k = jnp.minimum(t_k, sphere0(tx, ty, tz, tip_radius))
        inv_lab = 1.0 / jnp.sqrt(ab2)
        d_par = (rx * abx + ry * aby + rz * abz) * inv_lab
        o_par = -(ax * abx + ay * aby + az * abz) * inv_lab
        qa = jnp.maximum(1.0 - d_par * d_par, 1e-9)
        qb = -(ax * rx + ay * ry + az * rz) - o_par * d_par
        qc = ax * ax + ay * ay + az * az - o_par * o_par - hand_radius * hand_radius
        disc = qb * qb - qa * qc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_cyl = (-qb - sq) / qa
        hseg = o_par + d_par * t_cyl
        on_seg = (hseg >= 0.0) & (hseg * hseg <= ab2)
        t_k = jnp.minimum(
            t_k, jnp.where((disc > 0.0) & (t_cyl > 0.0) & on_seg, t_cyl, rc.BIG))

        t = jnp.minimum(jnp.minimum(jnp.minimum(t_t, t_p), t_s), t_k)
        # first-wins tie order: table (0), plug (1), socket (2), kuka (3) —
        # same as the XLA exact path's argmin over the stacked t array
        comp = jnp.where(t_t <= t, 0.0,
                         jnp.where(t_p <= t, 1.0, jnp.where(t_s <= t, 2.0, 3.0)))
        dmin = jnp.where(t < far - 1e-6, 0.0, 1.0)
        t_out[...] = jnp.minimum(t, far)
        dmin_out[...] = dmin
        comp_out[...] = comp
        return

    def scene(t):
        d_plug = _plug_sdf_planes(opx + dpx * t, opy + dpy * t, opz + dpz * t,
                                  oh, phx, phy, plen)
        d_sock = _socket_sdf_planes(osx + dsx * t, osy + dsy * t, osz + dsz * t,
                                    oh, hhx, hhy, sheight, plate_hx, plate_hy)
        d_table = (cam_z + dwz * t) - table_h
        return d_table, d_plug, d_sock, kuka_sdf(t)

    t = jnp.full(dpx.shape, near, dpx.dtype)
    for _ in range(iters):
        dt, dp, ds, dk = scene(t)
        d = jnp.minimum(jnp.minimum(jnp.minimum(dt, dp), ds), dk)
        t = jnp.minimum(t + jnp.maximum(d, 1e-4), far)

    dt, dp, ds, dk = scene(t)
    dmin = jnp.minimum(jnp.minimum(jnp.minimum(dt, dp), ds), dk)
    # argmin first-wins tie order: table (0), plug (1), socket (2), kuka (3)
    comp = jnp.where(dt <= dmin, 0.0,
                     jnp.where(dp <= dmin, 1.0, jnp.where(ds <= dmin, 2.0, 3.0)))
    t_out[...] = t
    dmin_out[...] = dmin
    comp_out[...] = comp


def camera_march_fused(
    M_plug: jax.Array,   # [N, 3, 3] camera→plug rotations
    o_plug: jax.Array,   # [N, 3]
    M_sock: jax.Array,   # [N, 3, 3]
    o_sock: jax.Array,   # [N, 3]
    cam_R_zrow: jax.Array,  # [N, 3] world-z row of the camera rotation
    cam_z: jax.Array,       # [N] camera world z
    kind_onehot: jax.Array,
    plug_hx, plug_hy, plug_length, hole_hx, hole_hy, socket_height, table_h,
    rays_c: jax.Array,   # [HW_pad, 3]
    iters: int, near: float, far: float, plate_hx: float, plate_hy: float,
    tips_cam: jax.Array | None = None,   # [N, 3, 3] fingertip centers (camera frame)
    wrist_cam: jax.Array | None = None,  # [N, 3] capsule end a
    hand_cam: jax.Array | None = None,   # [N, 3] capsule end b
    tip_radius: float = 0.018, hand_radius: float = 0.045,
    interpret: bool | None = None,
    exact: bool = False,
    block_r: int | None = None,
):
    """Returns (t_hit, d_min, comp) planes [N, HW_pad]; comp ∈ {0 table,
    1 plug, 2 socket, 3 kuka} as float. `exact=True` replaces the march with
    closed-form intersections inside the same VMEM kernel (exact depths; with
    it, d_min is 0.0 on hit / 1.0 on miss)."""
    n, hw = M_plug.shape[0], rays_c.shape[0]
    assert hw % LANE == 0
    max_rows = _max_rows()
    if n > max_rows:
        # row-chunk oversized batches (see tactile_march_fused / _max_rows)
        parts = []
        for s in range(0, n, max_rows):
            e = min(s + max_rows, n)
            parts.append(camera_march_fused(
                M_plug[s:e], o_plug[s:e], M_sock[s:e], o_sock[s:e],
                cam_R_zrow[s:e], cam_z[s:e], kind_onehot[s:e],
                plug_hx[s:e], plug_hy[s:e], plug_length[s:e], hole_hx[s:e],
                hole_hy[s:e], socket_height[s:e], table_h[s:e], rays_c,
                iters, near, far, plate_hx, plate_hy,
                tips_cam=None if tips_cam is None else tips_cam[s:e],
                wrist_cam=None if wrist_cam is None else wrist_cam[s:e],
                hand_cam=None if hand_cam is None else hand_cam[s:e],
                tip_radius=tip_radius, hand_radius=hand_radius,
                interpret=interpret, exact=exact, block_r=block_r))
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(3))
    br = _block_r(block_r)
    n_pad = ((n + br - 1) // br) * br

    if tips_cam is None:
        # park the proxy robot far behind the camera: never hit
        tips_cam = jnp.full((n, 3, 3), -100.0, M_plug.dtype)
        wrist_cam = jnp.full((n, 3), -100.0, M_plug.dtype)
        hand_cam = jnp.full((n, 3), -101.0, M_plug.dtype)

    from . import raycast as rc

    hp_p, quad_p = rc.section_halfplanes(kind_onehot, plug_hx, plug_hy)
    hp_h, quad_h = rc.section_halfplanes(kind_onehot, hole_hx, hole_hy)
    scal = jnp.concatenate(
        [
            M_plug.reshape(n, 9), o_plug, M_sock.reshape(n, 9), o_sock,
            cam_R_zrow, cam_z[:, None], kind_onehot,
            plug_hx[:, None], plug_hy[:, None], plug_length[:, None],
            hole_hx[:, None], hole_hy[:, None], socket_height[:, None],
            table_h[:, None],
            tips_cam.reshape(n, 9), wrist_cam, hand_cam,
            hp_p.reshape(n, 3 * rc.HP_SLOTS), quad_p,
            hp_h.reshape(n, 3 * rc.HP_SLOTS), quad_h,
            jnp.zeros((n, LANE - 98), M_plug.dtype),
        ],
        axis=1,
    )
    scal = _pad_axis(scal, n_pad, axis=0)
    if n_pad > n:
        scal = scal.at[n:, 34:40].set(1.0)  # avoid 0/0 in padded-row SDFs
        scal = scal.at[n:, 41:56].set(-100.0)  # park padded-row robot proxies

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    grid = (n_pad // br,)
    kernel = functools.partial(
        _camera_kernel, iters=iters, near=near, far=far,
        plate_hx=plate_hx, plate_hy=plate_hy,
        tip_radius=tip_radius, hand_radius=hand_radius, exact=exact,
    )
    plane = pl.BlockSpec((br, hw), lambda i: (i, 0))
    t_hit, dmin, comp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, LANE), lambda i: (i, 0)),
            pl.BlockSpec((3, hw), lambda i: (0, 0)),
        ],
        out_specs=[plane] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_pad, hw), M_plug.dtype)] * 3,
        interpret=interpret,
    )(scal, rays_c.T)
    return t_hit[:n], dmin[:n], comp[:n]
