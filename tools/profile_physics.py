"""Component-level physics substep profiler: ranks the cost of each stage
(FK+tangents, CRBA, bias, tip Jacobians, contact gen, solver, implicit PD)
by timing each as its own jit at a given batch size. Absolute numbers include
per-jit dispatch; use for *ranking* and before/after comparisons.

Usage: python tools/profile_physics.py [n_envs] [reps]
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


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:22s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main(n_envs=1024, reps=20):
    from isaacgyminsertion_tpu.assets import (
        SOCKET_PT_COUNT,
        TABLE_PT_IDX,
        build_subassembly_set,
    )
    from isaacgyminsertion_tpu.ops import f32_matmul
    from isaacgyminsertion_tpu.ops import rotations as rot
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

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    key = jax.random.PRNGKey(0)
    sub_idx = jax.random.randint(key, (n_envs,), 0, len(subs.names))
    params = engine.make_params(subs, sub_idx, n_envs)
    state = engine.initial_state(n_envs, model)
    ctrl = engine.ControlInput(
        q_target=state.q,
        tau_cmd=jnp.zeros((n_envs, 15)),
        torque_mode_mask=jnp.zeros((15,)),
        plug_wrench=jnp.zeros((n_envs, 6)),
    )
    h = (1.0 / 60.0) / 3.0

    @jax.jit
    @f32_matmul
    def fk_stage(q, qd):
        return fk_jacobians_with_tangents(model, q, qd)

    fk, J, fk_dot, J_dot = fk_stage(state.q, state.qd)

    @jax.jit
    @f32_matmul
    def crba_stage(q):
        return mass_matrix(model, q, fk=fk, J=J)

    @jax.jit
    @f32_matmul
    def bias_stage(q, qd):
        return bias_forces(model, q, qd, gravity=0.0, fk=fk, J=J, J_dot=J_dot)

    @jax.jit
    @f32_matmul
    def tipjac_stage(qd):
        _tq, tip_t = engine.fingertip_poses(model, fk)
        Jtips = jnp.stack(
            [point_jacobian(model, fk, tip_t[..., i, :], engine.FINGER_BODIES[i])
             for i in range(3)],
            axis=-3,
        )
        return Jtips, jnp.einsum("...fij,...j->...fi", Jtips[..., :3, :], qd), tip_t

    Jtips, tip_vel, tip_t = tipjac_stage(state.qd)
    com_w = engine._com_of(state, params)

    @jax.jit
    @f32_matmul
    def contact_stage(plug_quat, plug_pos):
        cs_f, _aux = fingertip_plug_contacts(
            tip_t, tip_vel, plug_quat, plug_pos, com_w,
            params.kind_onehot, params.plug_hx, params.plug_hy,
            params.plug_length, params.contact,
        )
        tbl_idx = jnp.asarray(TABLE_PT_IDX)
        cs_e = plug_env_contacts(
            params.surface_points[:, :SOCKET_PT_COUNT],
            params.surface_weights[:, :SOCKET_PT_COUNT],
            params.surface_points[:, tbl_idx],
            params.surface_weights[:, tbl_idx],
            plug_quat, plug_pos, com_w,
            params.socket_quat, params.socket_pos, params.kind_onehot,
            params.hole_hx, params.hole_hy, params.socket_height,
            params.table_height, params.contact,
        )
        return concat_contacts(cs_f, cs_e)

    cs = contact_stage(state.plug_quat, state.plug_pos)
    I_inv_w = engine._plug_inertia_world(state.plug_quat, params.plug_inertia, inverse=True)

    if jax.default_backend() == "tpu":
        from isaacgyminsertion_tpu.physics.solver_pallas import solve_contacts_fused

        @jax.jit
        @f32_matmul
        def solver_stage(v, w):
            return solve_contacts_fused(params.plug_mass, I_inv_w, v, w, cs, h,
                                        iters=engine.SOLVER_ITERS)
    else:
        from isaacgyminsertion_tpu.physics.solver import solve_contacts

        @jax.jit
        @f32_matmul
        def solver_stage(v, w):
            return solve_contacts(params.plug_mass, I_inv_w, v, w, cs, h,
                                  iters=engine.SOLVER_ITERS, beta=0.0)

    M = crba_stage(state.q)
    C = bias_stage(state.q, state.qd)

    @jax.jit
    @f32_matmul
    def pd_stage(q, qd):
        return implicit_pd_step(
            model, q, qd, ctrl.q_target, params.kp, params.kd,
            jnp.zeros((n_envs, 15)), h, M, C,
            torque_mode_mask=ctrl.torque_mode_mask, tau_cmd=ctrl.tau_cmd,
        )

    @jax.jit
    def full_substep(st):
        return engine.substep(model, params, st, ctrl, h)

    print(f"== physics component ranking @ {n_envs} envs (x{reps}) on "
          f"{jax.default_backend()}")
    timeit("fk+jac+tangents", fk_stage, state.q, state.qd, reps=reps)
    timeit("mass_matrix", crba_stage, state.q, reps=reps)
    timeit("bias_forces", bias_stage, state.q, state.qd, reps=reps)
    timeit("tip_jacobians", tipjac_stage, state.qd, reps=reps)
    timeit("contact_gen", contact_stage, state.plug_quat, state.plug_pos, reps=reps)
    timeit("contact_solve", solver_stage, state.plug_v, state.plug_w, reps=reps)
    timeit("implicit_pd", pd_stage, state.q, state.qd, reps=reps)
    timeit("FULL substep", full_substep, state, reps=reps)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
