"""Point-cloud generation + augmentation (pure JAX, fixed shapes).

Replaces tasks/utils/pcl_utils.py (pinhole back-projection, per-env Python
loops pcl_utils.py:203-212) and factory_utils.PointCloudAugmentations
(factory_utils.py:83-166) with batched array programs.

Fixed-size masked sampling: the reference randomly downsamples a variable
number of segmented pixels to num_points (pcl_utils.py:92-97). Under jit the
count must be static, so we score every pixel with (mask + uniform noise) and
take the top-k — uniform random selection among valid pixels, fixed [N, K]
output, with invalid points parked at the workspace floor.

Assembly contract (hard, SURVEY.md §8.3): the merged cloud is ordered
[plug pts | socket pts | goal pts | scene pts] (factory_task_insertion.py:
1014-1027), since the student slices it positionally (tact.py:541-570).

Layout: internals run on [N, P] x/y/z coordinate planes (SoA) — an
[N, 5184, 3] point array pads its minor axis 3 → 128 TPU lanes (~42× the
bytes/VPU work), and the back-projection over every camera pixel is the
largest point batch in the framework. AoS [N, K, 3] clouds are assembled
only at the K≈400-per-part outputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rotations as rot
from .camera import SEG_PLUG, SEG_SOCKET, CameraConfig, _pixel_rays


def _backproject_planes(cfg: CameraConfig, depth_raw: jax.Array):
    """World-frame (x, y, z) planes [N, H*W] from ray-march depth."""
    n = depth_raw.shape[0]
    d = depth_raw.reshape(n, -1)
    rays_c = _pixel_rays(cfg).reshape(-1, 3)
    cam_q = jnp.asarray(cfg.cam_quat, depth_raw.dtype)
    cam_t = jnp.asarray(cfg.cam_pos, depth_raw.dtype)
    rays_w = rot.quat_apply(cam_q, rays_c)          # [HW, 3], constant-sized
    x = cam_t[0] + rays_w[:, 0] * d
    y = cam_t[1] + rays_w[:, 1] * d
    z = cam_t[2] + rays_w[:, 2] * d
    return x, y, z


def backproject(cfg: CameraConfig, depth_raw: jax.Array) -> jax.Array:
    """World-frame points [N, H, W, 3] from ray-march depth."""
    x, y, z = _backproject_planes(cfg, depth_raw)
    return jnp.stack([x, y, z], axis=-1).reshape(depth_raw.shape + (3,))


def _downsample_planes(x, y, z, valid, k: int, key, fill_value: float = 0.0):
    """Uniformly sample k of the valid columns → [N, k, 3] (fixed shape).

    IGT_PCL_TOPK=approx swaps the exact top-k sort for TPU-optimized
    jax.lax.approx_max_k (recall ~0.95): with random scores the selected
    set is still uniform over valid pixels, but when fewer than ~k/0.95
    pixels are valid a few slots may fall to invalid pixels (parked at
    fill_value by the ok-mask below). Default stays exact."""
    import os

    k_score, k_rep = jax.random.split(key)
    score = valid.astype(x.dtype) + jax.random.uniform(k_score, valid.shape)
    if os.environ.get("IGT_PCL_TOPK") == "approx":
        _, idx = jax.lax.approx_max_k(score, k)            # [N, k]
    else:
        _, idx = jax.lax.top_k(score, k)                   # [N, k]
    take = lambda p: jnp.take_along_axis(p, idx, axis=1)
    ok = take(valid)
    # fewer than k valid pixels: RESAMPLE the valid set WITH replacement
    # instead of zero-filling (reference random-downsample semantics,
    # pcl_utils.py:92-97 np.random.choice over the valid set). Round-5
    # student postmortem: zero-fill planted a fat fake cluster at the origin
    # whenever the plug was small/occluded — poison for the PointNet, and
    # the jitter augment then disguised the zeros as near-origin "points".
    # top_k ordering puts the c valid columns first, so a with-replacement
    # draw over [0, c) re-indexes into them.
    c = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.int32)   # [N, 1]
    j = jax.random.randint(k_rep, idx.shape, 0, jnp.maximum(c, 1))
    idx = jnp.where(ok, idx, jnp.take_along_axis(idx, j, axis=1))
    ok = jnp.take_along_axis(valid, idx, axis=1)  # False only when c == 0
    take = lambda p: jnp.take_along_axis(p, idx, axis=1)
    pts = jnp.stack([take(x), take(y), take(z)], axis=-1)
    return jnp.where(ok[..., None], pts, fill_value)


def masked_downsample(
    points: jax.Array,      # [N, P, 3]
    valid: jax.Array,       # [N, P] bool
    k: int,
    key: jax.Array,
    fill_value: float = 0.0,
) -> jax.Array:
    """Uniformly sample k points from the valid set (fixed shape [N, k, 3])."""
    return _downsample_planes(points[..., 0], points[..., 1], points[..., 2],
                              valid, k, key, fill_value)


WS_LO = (0.3, -0.25, -0.01)
WS_HI = (0.8, 0.25, 0.4)


def _crop_planes(x, y, z, lo=WS_LO, hi=WS_HI):
    return ((x >= lo[0]) & (x <= hi[0]) & (y >= lo[1]) & (y <= hi[1])
            & (z >= lo[2]) & (z <= hi[2]))


def workspace_crop(points: jax.Array, lo=WS_LO, hi=WS_HI) -> jax.Array:
    """Validity mask for the workspace box (filter_pts, factory_task_insertion.py:66-77)."""
    return _crop_planes(points[..., 0], points[..., 1], points[..., 2], lo, hi)


class PclAugmentConfig(NamedTuple):
    """PointCloudAugmentations parity (factory_utils.py:83-166).

    Defaults = what the reference ACTUALLY APPLIES: `augment()` calls only
    `random_noise` (±1 mm clipped gaussian jitter on ~30% of points + a
    per-env constant offset); random_rotate / add_outliers /
    batch_random_dropout are present but COMMENTED OUT
    (factory_utils.py:158-166). Round-3/4/5 attempt-1..3 trained with
    rotate ±30° + scale + outliers + dropout active — far harsher input
    corruption than the reference student ever sees; off by default now,
    knobs kept for robustness studies."""

    jitter_std: float = 0.001
    jitter_clip: float = 0.001     # reference noise_clip
    jitter_frac: float = 0.3       # reference noise_prob
    rotate_deg: float = 0.0        # reference: commented out (was ±30)
    scale_range: tuple = (1.0, 1.0)   # reference: commented out
    outlier_frac: float = 0.0      # reference: commented out
    dropout_frac: float = 0.0      # reference: commented out


def augment_pcl(points: jax.Array, key: jax.Array, cfg: PclAugmentConfig, enable: jax.Array):
    """Random jitter/rotate/scale/outliers/dropout; `enable` [N] gates per env."""
    n = points.shape[0]
    k1, k1m, k1c, k2, k3, k4, k5, k6 = jax.random.split(key, 8)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    # jitter (reference random_noise): clipped gaussian on a random ~30%
    # subset of points + a clipped per-env constant offset
    kx, ky, kz = jax.random.split(k1, 3)
    jit = lambda p, kk: jnp.clip(cfg.jitter_std * jax.random.normal(kk, p.shape),
                                 -cfg.jitter_clip, cfg.jitter_clip)
    jmask = (jax.random.uniform(k1m, x.shape) < cfg.jitter_frac).astype(x.dtype)
    const = jnp.clip(
        cfg.jitter_std * jax.random.normal(k1c, (n, 1, 3)),
        -cfg.jitter_clip, cfg.jitter_clip)
    x = x + jit(x, kx) * jmask + const[..., 0]
    y = y + jit(y, ky) * jmask + const[..., 1]
    z = z + jit(z, kz) * jmask + const[..., 2]
    if cfg.rotate_deg > 0.0:
        # rotate about z by ±rotate_deg around the centroid
        ang = jnp.deg2rad(cfg.rotate_deg) * 2.0 * (jax.random.uniform(k2, (n, 1)) - 0.5)
        c, s = jnp.cos(ang), jnp.sin(ang)
        cx = jnp.mean(x, axis=1, keepdims=True)
        cy = jnp.mean(y, axis=1, keepdims=True)
        rx, ry = x - cx, y - cy
        rx, ry = c * rx - s * ry, s * rx + c * ry
        x, y = cx + rx, cy + ry
    if cfg.scale_range != (1.0, 1.0):
        sc = jax.random.uniform(k3, (n, 1), minval=cfg.scale_range[0],
                                maxval=cfg.scale_range[1])
        cx = jnp.mean(x, axis=1, keepdims=True)
        cy = jnp.mean(y, axis=1, keepdims=True)
        cz = jnp.mean(z, axis=1, keepdims=True)
        x = cx + (x - cx) * sc
        y = cy + (y - cy) * sc
        z = cz + (z - cz) * sc
    if cfg.outlier_frac > 0.0:
        # outliers: replace a fraction with uniform noise in the local bbox
        out_mask = jax.random.uniform(k4, x.shape) < cfg.outlier_frac
        k5x, k5y, k5z = jax.random.split(k5, 3)
        bb = lambda p, kk: (jnp.min(p, axis=1, keepdims=True)
                            + jax.random.uniform(kk, p.shape)
                            * (jnp.max(p, axis=1, keepdims=True)
                               - jnp.min(p, axis=1, keepdims=True)))
        x = jnp.where(out_mask, bb(x, k5x), x)
        y = jnp.where(out_mask, bb(y, k5y), y)
        z = jnp.where(out_mask, bb(z, k5z), z)
    if cfg.dropout_frac > 0.0:
        # dropout: duplicate the first point over a random fraction
        rd = jax.random.uniform(k6, x.shape) < cfg.dropout_frac
        x = jnp.where(rd, x[:, :1], x)
        y = jnp.where(rd, y[:, :1], y)
        z = jnp.where(rd, z[:, :1], z)
    out = jnp.stack([x, y, z], axis=-1)
    return jnp.where(enable[:, None, None], out, points)


def assemble_scene_pcl(
    cfg: CameraConfig,
    depth_raw: jax.Array,     # [N, H, W]
    seg: jax.Array,           # [N, H, W] int
    goal_pts: jax.Array,      # [N, G, 3] plug dense points at socket pose
    key: jax.Array,
    num_plug: int = 400,
    num_socket: int = 400,
    num_goal: int = 400,
    num_scene: int = 0,
    include_plug: bool = True,
    merge_socket: bool = True,
    merge_goal: bool = False,
    include_all: bool = False,
) -> jax.Array:
    """Merged cloud in the hard order [plug | socket | goal | scene]."""
    n = depth_raw.shape[0]
    x, y, z = _backproject_planes(cfg, depth_raw)
    segf = seg.reshape(n, -1)
    in_ws = _crop_planes(x, y, z)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    parts = []
    if include_plug:
        parts.append(_downsample_planes(x, y, z, in_ws & (segf == SEG_PLUG),
                                        num_plug, k1))
    if merge_socket:
        parts.append(_downsample_planes(x, y, z, in_ws & (segf == SEG_SOCKET),
                                        num_socket, k2))
    if merge_goal:
        gidx = jax.random.randint(k3, (n, num_goal), 0, goal_pts.shape[1])
        parts.append(jnp.take_along_axis(goal_pts, gidx[..., None], axis=1))
    if include_all or num_scene > 0:
        parts.append(_downsample_planes(x, y, z, in_ws, max(num_scene, 1), k4))
    return jnp.concatenate(parts, axis=1)
