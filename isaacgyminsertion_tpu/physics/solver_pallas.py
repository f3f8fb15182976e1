"""Fused Pallas contact solver — the hot kernel of the physics engine.

The XLA version (physics/solver.py) runs 16 velocity + 8 position Jacobi
iterations as a `lax.scan`, so every iteration round-trips ~15 [N, C] arrays
through HBM. This kernel keeps the whole contact set of a block of envs in
VMEM and unrolls all iterations in-register — one HBM read of the contact
data, one write of the results, ~24× less solver memory traffic.

Layout: contacts on the 128-lane axis (C padded to a lane multiple with
inactive rows), envs on sublanes (block 64). Per-env scalars (mass, I⁻¹, v,
w) ride as [B, 128]-padded planes. Semantics are bit-for-bit the algorithm of
solver.solve_contacts(beta=0) + solver.position_correction — verified against
it in tests/test_solver_pallas.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .solver import ContactSet

BLOCK_B = 64
LANE = 128


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _solver_kernel(
    # contact planes [B, C]
    rx, ry, rz, nx, ny, nz, vox, voy, voz, depth, mu, weight, stiff,
    # per-env scalars [B, LANE] (lane 0 holds the value)
    scal,  # columns: 0 inv_m, 1..9 I_inv (row major), 10..12 v, 13..15 w
    # outputs
    out_scal,  # [B, LANE]: 0..2 v, 3..5 w, 6..8 dx, 9..11 dth
    lam_n_out, lam_tx_out, lam_ty_out, lam_tz_out,
    *, iters: int, pos_iters: int, h: float, beta_pos: float, slop: float,
    max_corr: float,
):
    f32 = jnp.float32
    RX, RY, RZ = rx[...], ry[...], rz[...]
    NX, NY, NZ = nx[...], ny[...], nz[...]
    VOX, VOY, VOZ = vox[...], voy[...], voz[...]
    D = depth[...]
    MU = mu[...]
    W = weight[...]
    ST = stiff[...]

    S = scal[...]
    inv_m = S[:, 0:1]
    I00, I01, I02 = S[:, 1:2], S[:, 2:3], S[:, 3:4]
    I10, I11, I12 = S[:, 4:5], S[:, 5:6], S[:, 6:7]
    I20, I21, I22 = S[:, 7:8], S[:, 8:9], S[:, 9:10]
    vx, vy, vz = S[:, 10:11], S[:, 11:12], S[:, 12:13]
    wx, wy, wz = S[:, 13:14], S[:, 14:15], S[:, 15:16]

    active = jnp.where(D > 0.0, W, 0.0)
    n_active = jnp.maximum(jnp.sum(active, axis=1, keepdims=True), 1.0)
    mass = 1.0 / jnp.maximum(inv_m, 1e-12)
    m_eff = active * mass / n_active
    # impulse-clamped gel spring-damper (see solver.py for the stability math)
    d_pos = jnp.maximum(D, 0.0)
    is_soft = ST > 0.0
    soft_active = jnp.where(D > 0.0, 1.0, 0.0)

    lam_n = jnp.zeros_like(D)
    ltx = jnp.zeros_like(D)
    lty = jnp.zeros_like(D)
    ltz = jnp.zeros_like(D)

    def apply_impulse(vx, vy, vz, wx, wy, wz, fx, fy, fz):
        sfx = jnp.sum(fx, axis=1, keepdims=True)
        sfy = jnp.sum(fy, axis=1, keepdims=True)
        sfz = jnp.sum(fz, axis=1, keepdims=True)
        tx = jnp.sum(RY * fz - RZ * fy, axis=1, keepdims=True)
        ty = jnp.sum(RZ * fx - RX * fz, axis=1, keepdims=True)
        tz = jnp.sum(RX * fy - RY * fx, axis=1, keepdims=True)
        vx = vx + sfx * inv_m
        vy = vy + sfy * inv_m
        vz = vz + sfz * inv_m
        wx = wx + I00 * tx + I01 * ty + I02 * tz
        wy = wy + I10 * tx + I11 * ty + I12 * tz
        wz = wz + I20 * tx + I21 * ty + I22 * tz
        return vx, vy, vz, wx, wy, wz

    for _ in range(iters):
        # normal pass (zero bias — split impulse)
        vcx = vx + (wy * RZ - wz * RY) - VOX
        vcy = vy + (wz * RX - wx * RZ) - VOY
        vcz = vz + (wx * RY - wy * RX) - VOZ
        vn = NX * vcx + NY * vcy + NZ * vcz
        lam_rigid = jnp.maximum(lam_n - vn * m_eff, 0.0)
        # soft gel contacts: impulse-clamped spring-damper — resting contacts
        # must carry λ ≈ h·k·depth so the friction cone can hold the grasp
        spring_imp = jnp.minimum(h * ST * d_pos, 0.25 * m_eff * d_pos / h)
        c_imp = jnp.minimum(0.5 * jnp.sqrt(ST * mass) * h, 0.5 * m_eff)
        lam_soft = jnp.maximum(spring_imp - c_imp * vn, 0.0) * soft_active
        lam_new = jnp.where(is_soft, lam_soft, lam_rigid)
        dl = lam_new - lam_n
        lam_n = lam_new
        vx, vy, vz, wx, wy, wz = apply_impulse(
            vx, vy, vz, wx, wy, wz, NX * dl, NY * dl, NZ * dl
        )

        # friction pass
        vcx = vx + (wy * RZ - wz * RY) - VOX
        vcy = vy + (wz * RX - wx * RZ) - VOY
        vcz = vz + (wx * RY - wy * RX) - VOZ
        vn = NX * vcx + NY * vcy + NZ * vcz
        vtx = vcx - vn * NX
        vty = vcy - vn * NY
        vtz = vcz - vn * NZ
        # tangential effective mass with rotational coupling (r×t̂)ᵀI⁻¹(r×t̂)
        # (see solver.py: translational-only impulses overdrive low-inertia
        # rotation axes → round-peg yaw spin jitter)
        vt_mag = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz + 1e-16)
        thx_u, thy_u, thz_u = vtx / vt_mag, vty / vt_mag, vtz / vt_mag
        ux = RY * thz_u - RZ * thy_u
        uy = RZ * thx_u - RX * thz_u
        uz = RX * thy_u - RY * thx_u
        ang = (ux * (I00 * ux + I01 * uy + I02 * uz)
               + uy * (I10 * ux + I11 * uy + I12 * uz)
               + uz * (I20 * ux + I21 * uy + I22 * uz))
        m_eff_t = active / (n_active * (inv_m + ang))
        ntx = ltx - vtx * m_eff_t
        nty = lty - vty * m_eff_t
        ntz = ltz - vtz * m_eff_t
        lt_mag = jnp.sqrt(ntx * ntx + nty * nty + ntz * ntz)
        lt_max = MU * lam_n
        scale = jnp.minimum(1.0, lt_max / jnp.maximum(lt_mag, 1e-12))
        ntx, nty, ntz = ntx * scale, nty * scale, ntz * scale
        dtx, dty, dtz = ntx - ltx, nty - lty, ntz - ltz
        ltx, lty, ltz = ntx, nty, ntz
        vx, vy, vz, wx, wy, wz = apply_impulse(vx, vy, vz, wx, wy, wz, dtx, dty, dtz)

    # position correction (rigid contacts only)
    act_pos = jnp.where((D > 0.0) & (ST == 0.0), W, 0.0)
    n_act_pos = jnp.maximum(jnp.sum(act_pos, axis=1, keepdims=True), 1.0)
    m_eff_pos = act_pos * mass / n_act_pos
    dx = jnp.zeros_like(inv_m)
    dy = jnp.zeros_like(inv_m)
    dz = jnp.zeros_like(inv_m)
    thx = jnp.zeros_like(inv_m)
    thy = jnp.zeros_like(inv_m)
    thz = jnp.zeros_like(inv_m)
    lam_p = jnp.zeros_like(D)
    for _ in range(pos_iters):
        mx = dx + (thy * RZ - thz * RY)
        my = dy + (thz * RX - thx * RZ)
        mz = dz + (thx * RY - thy * RX)
        move_n = NX * mx + NY * my + NZ * mz
        depth_cur = D - move_n
        corr = jnp.minimum(
            jnp.maximum(beta_pos * (depth_cur - slop), 0.0), max_corr
        )
        lam_new = jnp.maximum(lam_p + corr * m_eff_pos, 0.0)
        dl = lam_new - lam_p
        lam_p = lam_new
        fx, fy, fz = NX * dl, NY * dl, NZ * dl
        sfx = jnp.sum(fx, axis=1, keepdims=True)
        sfy = jnp.sum(fy, axis=1, keepdims=True)
        sfz = jnp.sum(fz, axis=1, keepdims=True)
        tx = jnp.sum(RY * fz - RZ * fy, axis=1, keepdims=True)
        ty = jnp.sum(RZ * fx - RX * fz, axis=1, keepdims=True)
        tz = jnp.sum(RX * fy - RY * fx, axis=1, keepdims=True)
        dx = dx + sfx * inv_m
        dy = dy + sfy * inv_m
        dz = dz + sfz * inv_m
        thx = thx + I00 * tx + I01 * ty + I02 * tz
        thy = thy + I10 * tx + I11 * ty + I12 * tz
        thz = thz + I20 * tx + I21 * ty + I22 * tz

    res = jnp.concatenate(
        [vx, vy, vz, wx, wy, wz, dx, dy, dz, thx, thy, thz,
         jnp.zeros((vx.shape[0], LANE - 12), f32)],
        axis=1,
    )
    out_scal[...] = res
    lam_n_out[...] = lam_n
    lam_tx_out[...] = ltx
    lam_ty_out[...] = lty
    lam_tz_out[...] = ltz


class FusedSolveResult(NamedTuple):
    v: jax.Array
    w: jax.Array
    lam_n: jax.Array
    lam_t: jax.Array
    dx: jax.Array
    dth: jax.Array


def solve_contacts_fused(
    mass: jax.Array,      # [N]
    I_inv_w: jax.Array,   # [N, 3, 3]
    v: jax.Array,         # [N, 3]
    w: jax.Array,         # [N, 3]
    cs: ContactSet,
    h: float,
    iters: int = 16,
    pos_iters: int = 8,
    beta_pos: float = 0.3,
    slop: float = 2.0e-4,
    max_corr: float = 0.01,
    interpret: bool | None = None,
) -> FusedSolveResult:
    """Velocity solve + positional correction in one fused kernel."""
    n, c = cs.depth.shape
    c_pad = ((c + LANE - 1) // LANE) * LANE
    n_pad = ((n + BLOCK_B - 1) // BLOCK_B) * BLOCK_B

    def prep(x, fill=0.0):
        x = _pad_to(x, c_pad, axis=1, value=fill)
        return _pad_to(x, n_pad, axis=0, value=fill)

    planes = dict(
        rx=prep(cs.r[..., 0]), ry=prep(cs.r[..., 1]), rz=prep(cs.r[..., 2]),
        nx=prep(cs.n[..., 0]), ny=prep(cs.n[..., 1]), nz=prep(cs.n[..., 2]),
        vox=prep(cs.v_other[..., 0]), voy=prep(cs.v_other[..., 1]),
        voz=prep(cs.v_other[..., 2]),
        depth=prep(cs.depth, fill=-1.0), mu=prep(cs.mu), weight=prep(cs.weight),
        stiff=prep(cs.stiffness),
    )
    scal = jnp.concatenate(
        [
            (1.0 / jnp.maximum(mass, 1e-12))[:, None],
            I_inv_w.reshape(n, 9),
            v, w,
            jnp.zeros((n, LANE - 16), v.dtype),
        ],
        axis=1,
    )
    scal = _pad_to(scal, n_pad, axis=0)
    # padded envs need mass 1 to avoid inf
    if n_pad > n:
        scal = scal.at[n:, 0].set(1.0)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    grid = (n_pad // BLOCK_B,)
    bspec_c = pl.BlockSpec((BLOCK_B, c_pad), lambda i: (i, 0))
    bspec_s = pl.BlockSpec((BLOCK_B, LANE), lambda i: (i, 0))
    kernel = functools.partial(
        _solver_kernel, iters=iters, pos_iters=pos_iters, h=h,
        beta_pos=beta_pos, slop=slop, max_corr=max_corr,
    )
    out_scal, lam_n, ltx, lty, ltz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec_c] * 13 + [bspec_s],
        out_specs=[bspec_s] + [bspec_c] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, LANE), v.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), v.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), v.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), v.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), v.dtype),
        ],
        interpret=interpret,
    )(*planes.values(), scal)

    lam_t = jnp.stack([ltx[:n, :c], lty[:n, :c], ltz[:n, :c]], axis=-1)
    return FusedSolveResult(
        v=out_scal[:n, 0:3], w=out_scal[:n, 3:6],
        lam_n=lam_n[:n, :c], lam_t=lam_t,
        dx=out_scal[:n, 6:9], dth=out_scal[:n, 9:12],
    )
