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
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rotations as rot
from .camera import SEG_PLUG, SEG_SOCKET, CameraConfig, _pixel_rays


def backproject(
    cfg: CameraConfig,
    depth_raw: jax.Array,   # [N, H, W] metric depth along the ray
) -> jax.Array:
    """World-frame points [N, H, W, 3] from ray-march depth."""
    rays_c = _pixel_rays(cfg)
    cam_q = jnp.asarray(cfg.cam_quat, depth_raw.dtype)
    cam_t = jnp.asarray(cfg.cam_pos, depth_raw.dtype)
    rays_w = rot.quat_apply(cam_q, rays_c)
    return cam_t + rays_w * depth_raw[..., None]


def masked_downsample(
    points: jax.Array,      # [N, P, 3]
    valid: jax.Array,       # [N, P] bool
    k: int,
    key: jax.Array,
    fill_value: float = 0.0,
) -> jax.Array:
    """Uniformly sample k points from the valid set (fixed shape [N, k, 3])."""
    score = valid.astype(points.dtype) + jax.random.uniform(key, valid.shape)
    _, idx = jax.lax.top_k(score, k)                       # [N, k]
    pts = jnp.take_along_axis(points, idx[..., None], axis=1)
    ok = jnp.take_along_axis(valid, idx, axis=1)
    return jnp.where(ok[..., None], pts, fill_value)


def workspace_crop(points: jax.Array, lo=(0.3, -0.25, -0.01), hi=(0.8, 0.25, 0.4)) -> jax.Array:
    """Validity mask for the workspace box (filter_pts, factory_task_insertion.py:66-77)."""
    lo = jnp.asarray(lo, points.dtype)
    hi = jnp.asarray(hi, points.dtype)
    return jnp.all((points >= lo) & (points <= hi), axis=-1)


class PclAugmentConfig(NamedTuple):
    """PointCloudAugmentations parity (factory_utils.py:83-166)."""

    jitter_std: float = 0.001
    rotate_deg: float = 30.0       # randomize.pcl_rot
    scale_range: tuple = (0.95, 1.05)
    outlier_frac: float = 0.02
    dropout_frac: float = 0.1


def augment_pcl(points: jax.Array, key: jax.Array, cfg: PclAugmentConfig, enable: jax.Array):
    """Random jitter/rotate/scale/outliers/dropout; `enable` [N] gates per env."""
    n = points.shape[0]
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    out = points
    # jitter
    out = out + cfg.jitter_std * jax.random.normal(k1, out.shape)
    # rotate about z by ±rotate_deg around the centroid
    ang = jnp.deg2rad(cfg.rotate_deg) * 2.0 * (jax.random.uniform(k2, (n,)) - 0.5)
    c, s = jnp.cos(ang), jnp.sin(ang)
    centroid = jnp.mean(out, axis=1, keepdims=True)
    rel = out - centroid
    rel = jnp.stack(
        [c[:, None] * rel[..., 0] - s[:, None] * rel[..., 1],
         s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1],
         rel[..., 2]],
        axis=-1,
    )
    out = centroid + rel
    # scale
    sc = jax.random.uniform(k3, (n, 1, 1), minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
    out = centroid + (out - centroid) * sc
    # outliers: replace a fraction with uniform noise in the local bbox
    r = jax.random.uniform(k4, out.shape[:2])
    lo = jnp.min(out, axis=1, keepdims=True)
    hi = jnp.max(out, axis=1, keepdims=True)
    rand_pts = lo + jax.random.uniform(k5, out.shape) * (hi - lo)
    out = jnp.where((r < cfg.outlier_frac)[..., None], rand_pts, out)
    # dropout: duplicate the first point over a random fraction
    rd = jax.random.uniform(k6, out.shape[:2])
    out = jnp.where((rd < cfg.dropout_frac)[..., None], out[:, :1], out)
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
    pts = backproject(cfg, depth_raw).reshape(n, -1, 3)
    segf = seg.reshape(n, -1)
    in_ws = workspace_crop(pts)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    parts = []
    if include_plug:
        parts.append(masked_downsample(pts, in_ws & (segf == SEG_PLUG), num_plug, k1))
    if merge_socket:
        parts.append(masked_downsample(pts, in_ws & (segf == SEG_SOCKET), num_socket, k2))
    if merge_goal:
        gidx = jax.random.randint(k3, (n, num_goal), 0, goal_pts.shape[1])
        parts.append(jnp.take_along_axis(goal_pts, gidx[..., None], axis=1))
    if include_all or num_scene > 0:
        parts.append(masked_downsample(pts, in_ws, max(num_scene, 1), k4))
    return jnp.concatenate(parts, axis=1)
