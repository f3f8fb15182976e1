"""On-chip autotune/ablation for the Pallas render kernels.

Times the tactile and camera kernels standalone at the north-star row
counts (8192 envs → 24576 tactile rows, 8192 camera rows), sweeping:
  - block_r (rows per program): grid/VMEM tiling only, identical output;
  - tactile noise on/off: the in-kernel Box-Muller draw costs 2 log + 2
    sqrt + 2 cos + 2 sin per pixel — this run attributes that cost so we
    know whether a cheaper sampler is worth a parity deviation.

Run on the real chip (takes ~a minute); pick the best block_r and export
IGT_RENDER_BLOCK_R for bench/training if it beats the default 8.
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

from isaacgyminsertion_tpu.sensors import render_pallas as rp


def _time(fn, *args, iters=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def tactile_inputs(rows, hw=64 * 64, key=jax.random.PRNGKey(0)):
    ks = jax.random.split(key, 8)
    M = jnp.tile(jnp.eye(3)[None], (rows, 1, 1))
    o = jnp.concatenate(
        [jax.random.uniform(ks[0], (rows, 2), minval=-0.004, maxval=0.004),
         jnp.full((rows, 1), -0.01)], axis=1)
    kind = jax.nn.one_hot(jax.random.randint(ks[1], (rows,), 0, 6), 6)
    hx = jax.random.uniform(ks[2], (rows,), minval=0.006, maxval=0.012)
    hy = jax.random.uniform(ks[3], (rows,), minval=0.006, maxval=0.012)
    length = jnp.full((rows,), 0.05)
    force = jax.random.uniform(ks[4], (rows,), minval=0.0, maxval=40.0)
    ang = jnp.linspace(0, 6.28, hw)
    rays = jnp.stack([0.2 * jnp.cos(ang), 0.2 * jnp.sin(ang),
                      jnp.ones((hw,))], axis=1)
    rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
    return M, o, kind, hx, hy, length, force, rays


def main(n_envs=8192, capacity=0.75):
    # capacity mirrors the production render-on-demand gather
    # (envs/insertion.py render_capacity, bench.py sensors mode): the kernel
    # never sees the full N*3 rows in training. Timing the un-gathered full
    # batch at 8192 is not only unrepresentative — it vmem-OOMs (measured
    # 2026-08-20: scoped allocation 17.72M > 16M limit at 24576 rows; the
    # [rows, 128] packed operand alone is 12.6 MB of stack).
    print(f"backend = {jax.default_backend()}, n_envs = {n_envs}, "
          f"capacity = {capacity}")
    rows = int(n_envs * 3 * capacity)
    M, o, kind, hx, hy, length, force, rays = tactile_inputs(rows)
    key = jax.random.PRNGKey(1)

    def tact(block_r, noise_std, noise_kind="gauss"):
        f = jax.jit(lambda *a: rp.tactile_march_fused(
            *a, iters=24, max_range=0.022, max_deformation=0.002,
            force_range=60.0, exact=True, noise_key=key, noise_std=noise_std,
            glow=0.15, block_r=block_r, noise_kind=noise_kind))
        return _time(f, M, o, kind, hx, hy, length, force, rays)

    base = None
    for br in (8, 16, 32, 64):
        try:
            dt = tact(br, 0.01)
            dtf = tact(br, 0.01, "ih4")
            dt0 = tact(br, 0.0)
        except Exception as e:  # candidate OOM/compile failure: keep sweeping
            print(f"tactile block_r={br:>2}: FAILED "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:120]})")
            continue
        if base is None:
            base = dt
        print(f"tactile block_r={br:>2}: gauss {dt*1e3:7.2f} ms  "
              f"ih4 {dtf*1e3:7.2f} ms  noise-off {dt0*1e3:7.2f} ms  "
              f"(gauss-noise {100*(dt-dt0)/dt:4.1f}%, vs first {base/dt:4.2f}x)")

    if jax.default_backend() == "tpu":
        # ih4 sampler statistics (in-kernel path only exists on real TPU):
        # noise = img_on - img_off at matched seeds should be ~N(0, std²)
        f_on = rp.tactile_march_fused(
            M, o, kind, hx, hy, length, force, rays, iters=24,
            max_range=0.022, max_deformation=0.002, force_range=60.0,
            exact=True, noise_key=key, noise_std=0.05, glow=0.15,
            noise_kind="ih4", mask_flat=jnp.ones((rays.shape[0],)))
        f_off = rp.tactile_march_fused(
            M, o, kind, hx, hy, length, force, rays, iters=24,
            max_range=0.022, max_deformation=0.002, force_range=60.0,
            exact=True, glow=0.15, mask_flat=jnp.ones((rays.shape[0],)))
        d = (f_on - jnp.clip(f_off, 0.0, 1.0))
        # avoid clip censoring: only interior-range pixels
        sel = (f_off > 0.2) & (f_off < 0.8)
        dd = jnp.where(sel, d, jnp.nan)
        mean = float(jnp.nanmean(dd))
        std = float(jnp.sqrt(jnp.nanvar(dd)))
        print(f"ih4 stats on interior px: mean {mean:+.5f} (want ~0), "
              f"std {std:.5f} (want ~0.05)")

    # camera at [N] rows, 54x96 → padded lane multiple
    n = n_envs
    hw = ((54 * 96 + rp.LANE - 1) // rp.LANE) * rp.LANE
    Mp = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    op = jnp.tile(jnp.array([[0.0, 0.0, 0.4]]), (n, 1))
    zrow = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    camz = jnp.full((n,), 0.5)
    kindc = jax.nn.one_hot(jnp.zeros((n,), jnp.int32), 6)
    sc = jnp.full((n,), 0.01)
    ang = jnp.linspace(0, 6.28, hw)
    raysc = jnp.stack([0.3 * jnp.cos(ang), 0.3 * jnp.sin(ang),
                       jnp.ones((hw,))], axis=1)
    raysc = raysc / jnp.linalg.norm(raysc, axis=1, keepdims=True)

    def cam(block_r):
        f = jax.jit(lambda: rp.camera_march_fused(
            Mp, op, Mp, op, zrow, camz, kindc, sc, sc, jnp.full((n,), 0.05),
            sc * 1.1, sc * 1.1, jnp.full((n,), 0.02), jnp.zeros((n,)), raysc,
            iters=48, near=0.1, far=1.0, plate_hx=0.08, plate_hy=0.08,
            exact=True, block_r=block_r))
        return _time(f)

    for br in (8, 16, 32, 64):
        try:
            dt = cam(br)
        except Exception as e:
            print(f"camera  block_r={br:>2}: FAILED "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:120]})")
            continue
        print(f"camera  block_r={br:>2}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
