"""Microbench: articulation-path layout experiment (N-first vs N-last).

Round-1 finding: the physics step is bandwidth-bound and the [N, small]
layouts pad the 128-lane axis (3→128 on vectors, 15→128 on dof axes).
This compares the production substep (batch-first arrays) against the same
substep vmapped with the env batch on the LAST axis (in_axes/out_axes=-1),
which makes elementwise intermediates [small..., N] planes.
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


def main(n_envs=8192, iters=30):
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs import insertion as ins
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics import engine
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    state = ins.reset_all(cfg, model, subs, jax.random.PRNGKey(0), n_envs)
    phys, params = state.phys, state.params
    ctrl = engine.ControlInput(
        q_target=phys.q, tau_cmd=jnp.zeros_like(phys.q),
        torque_mode_mask=jnp.zeros((15,)), plug_wrench=jnp.zeros((n_envs, 6)),
    )
    h = cfg.sim.dt / cfg.sim.substeps

    def run(label, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out.q)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out.q)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms/substep")
        return dt

    from isaacgyminsertion_tpu.physics.dynamics import (
        bias_forces,
        fk_jacobians_with_tangents,
        implicit_pd_step,
        mass_matrix,
    )

    def artic(q, qd, q_target, kp, kd):
        """The articulation path: FK+J(+tangents), CRBA, bias, implicit PD."""
        fk, J, _fd, J_dot = fk_jacobians_with_tangents(model, q, qd)
        M = mass_matrix(model, q, fk=fk, J=J)
        C = bias_forces(model, q, qd, gravity=0.0, fk=fk, J=J, J_dot=J_dot)
        qn, qdn, drive = implicit_pd_step(
            model, q, qd, q_target, kp, kd, jnp.zeros_like(q), h, M, C)
        return qn + qdn  # force all outputs live

    def run2(label, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms")
        return dt

    args_b = (phys.q, phys.qd, phys.q, params.kp, params.kd)
    run2("articulation batch-first", jax.jit(artic), *args_b)

    args_l = tuple(jnp.moveaxis(a, 0, -1) for a in args_b)
    artic_last = jax.jit(jax.vmap(artic, in_axes=-1, out_axes=-1))
    try:
        run2("articulation N-last (vmap -1)", artic_last, *args_l)
    except Exception as e:
        print("N-last failed:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
