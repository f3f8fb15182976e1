"""Attribute the tactile sensor's step cost: Pallas kernel vs epilogue
(mask+glow+noise) vs queue update traffic, at the north-star env count.

Usage: python tools/profile_tactile_parts.py [n_envs] [reps]
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


def bench(fn, *args, reps=10, name=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s}: {dt * 1e3:8.2f} ms")
    return dt


def main(n=8192, reps=10):
    from isaacgyminsertion_tpu.ops import rotations as rot
    from isaacgyminsertion_tpu.sensors import tactile as T

    f = 3
    cfg = T.TactileConfig()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    tip_q = rot.quat_unit(jax.random.normal(ks[0], (n, f, 4)))
    tip_t = jax.random.uniform(ks[1], (n, f, 3), minval=0.45, maxval=0.55)
    plug_q = rot.quat_unit(jax.random.normal(ks[2], (n, 4)))
    plug_pos = jax.random.uniform(ks[3], (n, 3), minval=0.45, maxval=0.55)
    oh = jnp.eye(6)[jax.random.randint(ks[4], (n,), 0, 6)]
    hx = jax.random.uniform(ks[5], (n,), minval=0.005, maxval=0.02)
    hy = hx * 0.9
    ln = jnp.full((n,), 0.05)
    force = jax.random.uniform(ks[6], (n, f), maxval=8.0)

    # 1. full render (kernel + epilogue + noise)
    full = jax.jit(lambda q, t, pq, pp: T.render_tactile(
        cfg, q, t, pq, pp, oh, hx, hy, ln, force,
        noise_key=ks[7], noise_std=0.01))
    t_full = bench(full, tip_q, tip_t, plug_q, plug_pos, reps=reps,
                   name="render_tactile (noise on)")

    # 2. no noise
    nonoise = jax.jit(lambda q, t, pq, pp: T.render_tactile(
        cfg, q, t, pq, pp, oh, hx, hy, ln, force))
    t_non = bench(nonoise, tip_q, tip_t, plug_q, plug_pos, reps=reps,
                  name="render_tactile (no noise)")

    # 3. queue update traffic (concat shift + where), f32 vs bf16
    img = jnp.zeros((n, f, cfg.height, cfg.width, 3))
    for dt_ in (jnp.float32, jnp.bfloat16):
        q0 = jnp.zeros((n, 1, f, cfg.height, cfg.width, 3), dt_)
        im = img.astype(dt_)
        upd = jax.random.uniform(ks[4], (n,)) > 0.5

        def queue_step(q, im):
            latest = jnp.where(upd[:, None, None, None, None], im, q[:, 0])
            return jnp.concatenate([latest[:, None], q[:, :-1]], axis=1)

        bench(jax.jit(queue_step), q0, im, reps=reps,
              name=f"queue update {dt_.__name__}")

    # 4. noise generation alone at image scale
    def noise_only(k):
        return jax.random.normal(k, (n, f, cfg.height, cfg.width, 3)) * 0.01

    bench(jax.jit(noise_only), ks[7], reps=reps, name="noise normal() alone")

    print(f"epilogue+noise delta: {(t_full - t_non) * 1e3:.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
