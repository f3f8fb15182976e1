"""Velocity-level contact impulse solver (Jacobi + mass-splitting, pure JAX).

TPU-native replacement for PhysX's TGS iterative solver (SURVEY.md §2.9,
FactoryBaseTactile.yaml: solver_type TGS, 16 position iterations): all contacts
of the plug body are solved *simultaneously* per iteration (Jacobi with
mass-splitting — each contact sees the body mass divided by the number of
active contacts, the standard parallel-solver stabilization, matching PhysX's
Jacobi mode) instead of sequentially (Gauss-Seidel), because a batched
[N_env, C] update is one fused VPU pass while a serial sweep would be a
C-long dependency chain.

Semantics per contact:
  - inelastic normal impulse with Baumgarte bias β/h·max(depth−slop, 0),
    capped at max_depenetration_velocity 5 m/s (FactoryBaseTactile.yaml:31)
  - Coulomb friction: tangential impulse clamped to μ·λ_n
  - accumulated-impulse projection (λ_n ≥ 0) so resting contact is exact

The plug is the only dynamic body in the contact island (robot fingertips are
treated as kinematic on the contact timescale; their reaction forces feed the
articulation as external joint torques), so the solve needs no constraint
graph — just [N, C] arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ContactSet(NamedTuple):
    """All candidate contacts of the plug body, fixed shape [N, C, ...]."""

    r: jax.Array        # [N, C, 3] contact point − plug com (world)
    n: jax.Array        # [N, C, 3] unit normal, direction that pushes the plug OUT
    depth: jax.Array    # [N, C] penetration depth, >0 ⇒ active
    v_other: jax.Array  # [N, C, 3] velocity of the other body at the contact
    mu: jax.Array       # [N, C] friction coefficient
    weight: jax.Array   # [N, C] pressure-prior weight (assets._balanced_weights)
    stiffness: jax.Array  # [N, C] compliance: 0 = rigid; k>0 caps the normal
                          # impulse at h·k·depth (soft gel pads — AllSight gel
                          # max_deformation 0.01 m, tacto renderer.py:560-603)


class SolveResult(NamedTuple):
    v: jax.Array         # [N, 3] post-solve plug com linear velocity
    w: jax.Array         # [N, 3] post-solve angular velocity
    lam_n: jax.Array     # [N, C] normal impulses (N·s)
    lam_t: jax.Array     # [N, C, 3] friction impulses


def solve_contacts(
    mass: jax.Array,        # [N]
    I_inv_w: jax.Array,     # [N, 3, 3] world-frame inverse inertia
    v: jax.Array,           # [N, 3]
    w: jax.Array,           # [N, 3]
    cs: ContactSet,
    h: float,
    iters: int = 16,
    beta: float = 0.2,
    slop: float = 2.0e-4,
    max_depenetration_velocity: float = 5.0,
) -> SolveResult:
    active = (cs.depth > 0.0).astype(v.dtype) * cs.weight  # [N, C]
    n_active = jnp.maximum(jnp.sum(active, axis=-1, keepdims=True), 1.0)  # [N, 1]
    bias = jnp.clip(beta / h * jnp.maximum(cs.depth - slop, 0.0), 0.0,
                    max_depenetration_velocity)

    inv_m = (1.0 / mass)[..., None]                        # [N, 1]
    mass_b = mass[..., None]                               # [N, 1]
    # Weighted translational mass-splitting: contact i sees w_i·m/Σw. Including
    # the angular (r×n)ᵀI⁻¹(r×n) term in the denominator makes per-contact
    # impulses asymmetric across a symmetric manifold, which injects spurious
    # angular momentum on flat impacts (a Jacobi pathology); the balanced
    # pressure-prior weights keep flat impacts torque-free and the iteration
    # handles rotational coupling through the velocity updates.
    m_eff_n = active * mass[..., None] / n_active          # [N, C]

    def body(carry, _):
        v, w, lam_n, lam_t = carry
        v_c = v[..., None, :] + jnp.cross(w[..., None, :], cs.r) - cs.v_other
        v_n = jnp.einsum("...ci,...ci->...c", cs.n, v_c)

        dlam = (bias - v_n) * m_eff_n
        lam_rigid = jnp.maximum(lam_n + dlam, 0.0)
        # Compliant (gel) contacts are spring-dampers, not accumulated
        # projections: a RESTING contact must still carry λ = h·k·depth or the
        # friction cone μλ collapses to zero and the grasp holds nothing
        # (zero-bias velocity solves produce impulses only against approach
        # velocity). λ is recomputed per iteration from the current normal
        # velocity — it converges to the spring-damper force.
        # NOTE: no inf literals — XLA's algebraic simplifier can rewrite
        # inf-bearing selects into 0·inf=NaN forms.
        # Explicit spring-dampers are conditionally stable; both terms are
        # impulse-clamped against the per-contact effective mass so light
        # DR'd plugs (ωh ≈ 1.8) cannot ring or explode:
        #   spring impulse ≤ 0.25·m_eff·depth/h   (≤25% depenetration/substep)
        #   damping coeff  ≤ 0.5·m_eff/h
        d_pos = jnp.maximum(cs.depth, 0.0)
        spring_imp = jnp.minimum(h * cs.stiffness * d_pos,
                                 0.25 * m_eff_n * d_pos / h)
        c_imp = jnp.minimum(0.5 * jnp.sqrt(cs.stiffness * mass_b) * h,
                            0.5 * m_eff_n)
        lam_soft = jnp.maximum(spring_imp - c_imp * v_n, 0.0) * (cs.depth > 0.0)
        lam_n_new = jnp.where(cs.stiffness > 0.0, lam_soft, lam_rigid)
        dlam = lam_n_new - lam_n

        imp = cs.n * dlam[..., None]
        v = v + jnp.sum(imp, axis=-2) * inv_m
        w = w + jnp.einsum("...ij,...j->...i", I_inv_w,
                           jnp.sum(jnp.cross(cs.r, imp), axis=-2))

        # friction pass (recompute relative velocity after the normal pass)
        v_c = v[..., None, :] + jnp.cross(w[..., None, :], cs.r) - cs.v_other
        v_n_vec = jnp.einsum("...ci,...ci->...c", cs.n, v_c)[..., None] * cs.n
        v_t = v_c - v_n_vec
        # Tangential effective mass along the slip direction INCLUDING the
        # rotational coupling (r×t̂)ᵀI⁻¹(r×t̂): the translational-only
        # approximation overdrives impulses for low-inertia rotation axes —
        # a slim round peg's yaw (I_zz ≈ mr²/2, lever r) got impulses ~r²m/I_zz
        # ≈ 2× too large every iteration, leaving ~10 rad/s spin jitter that
        # random-walked the plug past the 0.4 rad degrasp limit.
        vt_mag = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1, keepdims=True) + 1e-16)
        t_hat = v_t / vt_mag
        u = jnp.cross(cs.r, t_hat)
        ang = jnp.einsum("...ci,...ij,...cj->...c", u, I_inv_w, u)
        m_eff_t = (active / (n_active * (1.0 / mass_b + ang)))[..., None]
        dlam_t = -v_t * m_eff_t
        lam_t_new = lam_t + dlam_t
        # project onto friction cone |λ_t| ≤ μ λ_n
        lt_mag = jnp.linalg.norm(lam_t_new, axis=-1, keepdims=True)
        lt_max = (cs.mu * lam_n_new)[..., None]
        scale = jnp.minimum(1.0, lt_max / jnp.maximum(lt_mag, 1e-12))
        lam_t_new = lam_t_new * scale
        dlam_t = lam_t_new - lam_t

        v = v + jnp.sum(dlam_t, axis=-2) * inv_m
        w = w + jnp.einsum("...ij,...j->...i", I_inv_w,
                           jnp.sum(jnp.cross(cs.r, dlam_t), axis=-2))
        return (v, w, lam_n_new, lam_t_new), None

    lam_n0 = jnp.zeros_like(cs.depth)
    lam_t0 = jnp.zeros_like(cs.r)
    (v, w, lam_n, lam_t), _ = jax.lax.scan(body, (v, w, lam_n0, lam_t0), None, length=iters)
    return SolveResult(v=v, w=w, lam_n=lam_n, lam_t=lam_t)


def position_correction(
    mass: jax.Array,        # [N]
    I_inv_w: jax.Array,     # [N, 3, 3]
    cs: ContactSet,
    iters: int = 8,
    beta: float = 0.3,
    slop: float = 2.0e-4,
    max_corr: float = 0.01,
) -> tuple[jax.Array, jax.Array]:
    """Split-impulse (NGS) positional depenetration: returns (Δcom, Δθ).

    The velocity solve runs with zero bias so resting contact adds **no**
    momentum (Baumgarte bias through asymmetric contact masses pumps angular
    momentum and tips resting bodies); penetration is instead removed by this
    pseudo-impulse projection whose corrections move the pose only — the
    standard split-impulse scheme, mirroring PhysX TGS position iterations.
    """
    # soft (gel) contacts absorb penetration elastically — only rigid
    # contacts participate in positional depenetration
    active = ((cs.depth > 0.0) & (cs.stiffness == 0.0)).astype(mass.dtype) * cs.weight
    n_active = jnp.maximum(jnp.sum(active, axis=-1, keepdims=True), 1.0)
    inv_m = (1.0 / mass)[..., None]
    m_eff = active * mass[..., None] / n_active

    def body(carry, _):
        dx, dth, lam = carry
        # current depth under the accumulated correction (linearized)
        move_n = jnp.einsum(
            "...ci,...ci->...c", cs.n, dx[..., None, :] + jnp.cross(dth[..., None, :], cs.r)
        )
        depth_cur = cs.depth - move_n
        corr = jnp.clip(beta * jnp.maximum(depth_cur - slop, 0.0), 0.0, max_corr)
        dlam = corr * m_eff
        lam_new = jnp.maximum(lam + dlam, 0.0)
        dlam = lam_new - lam
        imp = cs.n * dlam[..., None]
        dx = dx + jnp.sum(imp, axis=-2) * inv_m
        dth = dth + jnp.einsum("...ij,...j->...i", I_inv_w,
                               jnp.sum(jnp.cross(cs.r, imp), axis=-2))
        return (dx, dth, lam_new), None

    zero3 = jnp.zeros(mass.shape + (3,), mass.dtype)
    (dx, dth, _), _ = jax.lax.scan(
        body, (zero3, zero3, jnp.zeros_like(cs.depth)), None, length=iters
    )
    return dx, dth
