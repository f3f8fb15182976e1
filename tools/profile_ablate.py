"""In-graph ablation profiler: compiles VARIANTS of the physics step with
stages knocked out and diffs wall times — the only honest way to attribute
cost inside one fused jit (per-stage jits re-introduce dispatch/materialize
boundaries that XLA's fusion removes).

Variants (each = lax.scan of 3 substeps, like engine.step):
  full          the real substep
  no_solve      contact gen runs, solver replaced by free velocities
  no_contacts   solver runs on a zeroed contact set (gen knocked out)
  no_robot      FK/CRBA/bias/PD knocked out (robot frozen; plug-only)

Usage: python tools/profile_ablate.py [n_envs] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main(n_envs=8192, reps=10):
    from isaacgyminsertion_tpu.assets import (
        SOCKET_PT_COUNT,
        TABLE_PT_IDX,
        build_subassembly_set,
    )
    from isaacgyminsertion_tpu.ops import f32_matmul
    from isaacgyminsertion_tpu.physics import engine
    from isaacgyminsertion_tpu.physics.contact import (
        concat_contacts,
        fingertip_plug_contacts,
        plug_env_contacts,
    )
    from isaacgyminsertion_tpu.physics.dynamics import (
        bias_forces,
        fk_jacobians_with_tangents,
        implicit_pd_step,
        mass_matrix,
    )
    from isaacgyminsertion_tpu.physics.kinematics import point_jacobian
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
    from isaacgyminsertion_tpu.physics.solver_pallas import solve_contacts_fused
    from isaacgyminsertion_tpu.ops import rotations as rot

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    sub_idx = jax.random.randint(jax.random.PRNGKey(0), (n_envs,), 0, len(subs.names))
    params = engine.make_params(subs, sub_idx, n_envs)
    state0 = engine.initial_state(n_envs, model)
    ctrl = engine.ControlInput(
        q_target=state0.q, tau_cmd=jnp.zeros((n_envs, 15)),
        torque_mode_mask=jnp.zeros((15,)), plug_wrench=jnp.zeros((n_envs, 6)),
    )
    h = (1.0 / 60.0) / 3.0

    @f32_matmul
    def substep_variant(state, *, do_solve=True, do_contacts=True, do_robot=True):
        if do_robot:
            fk, J, _fkd, J_dot = fk_jacobians_with_tangents(model, state.q, state.qd)
            M = mass_matrix(model, state.q, fk=fk, J=J)
            C = bias_forces(model, state.q, state.qd, gravity=0.0, fk=fk, J=J, J_dot=J_dot)
            _tq, tip_t = engine.fingertip_poses(model, fk)
            Jtips = jnp.stack(
                [point_jacobian(model, fk, tip_t[..., i, :], engine.FINGER_BODIES[i])
                 for i in range(3)], axis=-3)
            tip_vel = jnp.einsum("...fij,...j->...fi", Jtips[..., :3, :], state.qd)
        else:
            tip_t = jnp.zeros((n_envs, 3, 3)) + state.plug_pos[:, None, :]
            tip_vel = jnp.zeros((n_envs, 3, 3))

        com_w = engine._com_of(state, params)
        I_inv_w = engine._plug_inertia_world(state.plug_quat, params.plug_inertia, inverse=True)
        v_free = state.plug_v
        w_free = state.plug_w

        if do_contacts:
            cs_f, _aux = fingertip_plug_contacts(
                tip_t, tip_vel, state.plug_quat, state.plug_pos, com_w,
                params.kind_onehot, params.plug_hx, params.plug_hy,
                params.plug_length, params.contact)
            tbl = jnp.asarray(TABLE_PT_IDX)
            cs_e = plug_env_contacts(
                params.surface_points[:, :SOCKET_PT_COUNT],
                params.surface_weights[:, :SOCKET_PT_COUNT],
                params.surface_points[:, tbl], params.surface_weights[:, tbl],
                state.plug_quat, state.plug_pos, com_w,
                params.socket_quat, params.socket_pos, params.kind_onehot,
                params.hole_hx, params.hole_hy, params.socket_height,
                params.table_height, params.contact)
            cs = concat_contacts(cs_f, cs_e)
        else:
            C_tot = 3 + SOCKET_PT_COUNT + len(TABLE_PT_IDX)
            from isaacgyminsertion_tpu.physics.solver import ContactSet
            z = jnp.zeros((n_envs, C_tot))
            z3 = jnp.zeros((n_envs, C_tot, 3))
            cs = ContactSet(r=z3, n=z3.at[..., 2].set(1.0), depth=z - 1.0,
                            v_other=z3, mu=z, weight=z + 1.0, stiffness=z)

        if do_solve:
            fused = solve_contacts_fused(params.plug_mass, I_inv_w, v_free, w_free,
                                         cs, h, iters=engine.SOLVER_ITERS)
            v_new, w_new, dx, dth = fused.v, fused.w, fused.dx, fused.dth
            lam_n, lam_t = fused.lam_n, fused.lam_t
        else:
            v_new, w_new = v_free, w_free
            dx = jnp.zeros_like(v_free)
            dth = jnp.zeros_like(w_free)
            lam_n = cs.depth * 0.0
            lam_t = cs.r * 0.0

        f_fing = (cs.n[..., :3, :] * lam_n[..., :3, None] + lam_t[..., :3, :]) / h
        com_new = com_w + h * v_new + dx
        dq = rot.quat_mul(
            jnp.concatenate([(w_new * h + dth) * 0.5,
                             jnp.zeros_like(w_new[..., :1])], -1), state.plug_quat)
        quat_new = rot.quat_unit(state.plug_quat + dq)
        pos_new = com_new - rot.quat_apply(quat_new, jnp.stack(
            [jnp.zeros_like(params.plug_com_z), jnp.zeros_like(params.plug_com_z),
             params.plug_com_z], -1))

        if do_robot:
            tau_ext = jnp.einsum("...fik,...fi->...k", Jtips[..., :3, :], -f_fing)
            q_new, qd_new, drive = implicit_pd_step(
                model, state.q, state.qd, ctrl.q_target, params.kp, params.kd,
                tau_ext, h, M, C, torque_mode_mask=ctrl.torque_mode_mask,
                tau_cmd=ctrl.tau_cmd)
        else:
            q_new, qd_new, drive = state.q, state.qd, state.ctrl_torque

        return state._replace(q=q_new, qd=qd_new, plug_pos=pos_new,
                              plug_quat=quat_new, plug_v=v_new, plug_w=w_new,
                              ctrl_torque=drive, tip_forces=-f_fing,
                              tip_fn=lam_n[..., :3] / h)

    def make_step(**kw):
        @jax.jit
        def stepfn(state):
            def body(s, _):
                return substep_variant(s, **kw), None
            out, _ = jax.lax.scan(body, state, None, length=3)
            return out
        return stepfn

    variants = dict(
        full=make_step(),
        no_solve=make_step(do_solve=False),
        no_contacts=make_step(do_contacts=False),
        no_robot=make_step(do_robot=False),
    )

    print(f"== in-graph ablation @ {n_envs} envs (x{reps})")
    times = {}
    for name, fn in variants.items():
        out = fn(state0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(out)
        jax.block_until_ready(out)
        times[name] = (time.perf_counter() - t0) / reps
        print(f"{name:12s} {times[name]*1e3:8.2f} ms/step", flush=True)
    full = times["full"]
    for name in ("no_solve", "no_contacts", "no_robot"):
        print(f"marginal {name[3:]:10s} {1e3*(full - times[name]):8.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
