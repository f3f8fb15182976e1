"""External depth + segmentation camera — batched SDF ray-march (pure JAX).

Replaces the IsaacGym camera sensors (factory_env_insertion.py:940-1003
external cam; task pipeline factory_task_insertion.py:896-1056) with an
XLA render pass: one ray-march over [N, H, W] pixels against the analytic
scene SDFs (plug, socket, table). Produces:

  depth [N, H, W]  — processed like DepthImageProcessor.process_depth_image
                     (factory_utils.py:55-72): noise, clip to [near, far],
                     normalize by −far
  seg   [N, H, W]  — segmentation ids (table 0, plug 2, socket 3 — actor
                     creation order, factory_env_insertion.py:814-848; the
                     kuka body (id 1) is above the 0.5 m far clip in the
                     default view and the student masks to {2,3} anyway,
                     ext_adapt.py:391-402)

Default intrinsics/pose follow FactoryEnvInsertionTactile.yaml external_cam
(96×54, real-calibrated pose) and FactoryTaskInsertionTactile.yaml
external_cam (near 0.1, far 0.5, dis_noise 0.001).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..assets import SOCKET_PLATE_HX, SOCKET_PLATE_HY
from ..ops import rotations as rot
from ..ops import sdf as sdfm

SEG_TABLE, SEG_KUKA, SEG_PLUG, SEG_SOCKET = 0, 1, 2, 3


class CameraConfig(NamedTuple):
    height: int = 54
    width: int = 96
    yfov: float = 0.75            # ~43° vertical
    near: float = 0.1             # near_clip
    far: float = 0.5              # far_clip
    dis_noise: float = 0.001
    march_iters: int = 24
    # real-calibrated pose (FactoryEnvInsertionTactile.yaml real_cam_pos/ori)
    cam_pos: tuple = (0.73114316, -0.01966786, 0.1629284)
    cam_quat: tuple = (0.60720, 0.6214361, -0.3433028, -0.3567319)


def _pixel_rays(cfg: CameraConfig):
    tan_half = jnp.tan(cfg.yfov / 2.0)
    aspect = cfg.width / cfg.height
    ys = jnp.linspace(tan_half, -tan_half, cfg.height)
    xs = jnp.linspace(-tan_half * aspect, tan_half * aspect, cfg.width)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    # optical axis = +z of the calibrated camera frame (the real_cam_ori quat
    # maps +z onto the view direction toward the socket)
    d = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def render_depth_seg(
    cfg: CameraConfig,
    plug_q: jax.Array,       # [N, 4]
    plug_pos: jax.Array,     # [N, 3]
    socket_q: jax.Array,
    socket_pos: jax.Array,
    kind_onehot: jax.Array,
    plug_hx: jax.Array,
    plug_hy: jax.Array,
    plug_length: jax.Array,
    hole_hx: jax.Array,
    hole_hy: jax.Array,
    socket_height: jax.Array,
    table_height: jax.Array,
    noise_key: jax.Array | None = None,
    cam_quat: jax.Array | None = None,   # [N, 4] per-env override (wrist cams)
    cam_pos: jax.Array | None = None,    # [N, 3]
    fused: bool | None = None,
    tip_pos: jax.Array | None = None,    # [N, 3, 3] fingertip centers (world)
    wrist_pos: jax.Array | None = None,  # [N, 3] wrist (capsule end a, world)
    hand_pos: jax.Array | None = None,   # [N, 3] hand frame (capsule end b)
    tip_radius: float = 0.018,
    hand_radius: float = 0.045,
    method: str = "exact",               # "exact" | "march" (SDF reference path)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (depth_normalized [N,H,W], seg [N,H,W] int32, depth_raw).

    With `cam_quat`/`cam_pos` the camera rides a per-env dynamic pose — the
    robot-attached viz cameras of the reference (factory_env_insertion.py:
    1005-1034); by default the static real-calibrated external pose is used.

    `method="exact"` (default) computes closed-form ray intersections
    (sensors/raycast.py, ~20× less math than the march and exact depths);
    `method="march"` keeps the SDF sphere-march: the XLA scan on CPU or the
    fused Pallas VMEM marcher on TPU (`fused` overrides that choice). The
    march path is retained as the independent reference implementation the
    exact path is parity-tested against.

    With `tip_pos`/`wrist_pos`/`hand_pos` the robot hand is rendered as a
    proxy SDF (3 fingertip spheres + wrist→hand capsule) with seg id 1
    (kuka) — the reference's depth images contain the descending hand inside
    the 0.5 m frustum (factory_env_insertion.py:940-1003, actor seg id 1).
    """
    n = plug_pos.shape[0]
    rays_c = _pixel_rays(cfg)                                  # [H, W, 3]
    if cam_quat is None:
        cam_q = jnp.asarray(cfg.cam_quat, plug_pos.dtype)
        cam_t = jnp.asarray(cfg.cam_pos, plug_pos.dtype)
    else:
        cam_q, cam_t = cam_quat, cam_pos

    inv_pq, inv_pt = rot.tf_inverse(plug_q, plug_pos)
    inv_sq, inv_st = rot.tf_inverse(socket_q, socket_pos)
    o_plug = inv_pt + rot.quat_apply(inv_pq, cam_t)            # [N, 3]
    o_sock = inv_st + rot.quat_apply(inv_sq, cam_t)

    if fused is None:
        fused = jax.default_backend() == "tpu"
    if method == "exact" and not fused:
        from . import raycast as rc

        rays_w = (
            jnp.broadcast_to(rot.quat_apply(cam_q, rays_c), (n,) + rays_c.shape)
            if cam_q.ndim == 1
            else rot.quat_apply(cam_q[:, None, None, :], rays_c[None])
        )
        rays_p = rot.quat_apply(inv_pq[:, None, None, :], rays_w)
        rays_s = rot.quat_apply(inv_sq[:, None, None, :], rays_w)
        ex = lambda a: a[:, None, None]
        t_plug = rc.plug_hit(
            ex(o_plug), rays_p, ex(kind_onehot), ex(plug_hx), ex(plug_hy),
            ex(plug_length),
        )
        t_sock = rc.socket_hit(
            ex(o_sock), rays_s, ex(kind_onehot), ex(hole_hx), ex(hole_hy),
            ex(socket_height), jnp.asarray(SOCKET_PLATE_HX, rays_w.dtype),
            jnp.asarray(SOCKET_PLATE_HY, rays_w.dtype),
        )
        cam_t_w = jnp.broadcast_to(cam_t, (n, 3)) if cam_t.ndim == 1 else cam_t
        o_w = cam_t_w[:, None, None]
        t_table = rc.table_hit(o_w, rays_w, ex(table_height))
        if tip_pos is not None:
            t_kuka = rc.capsule_hit(o_w, rays_w, wrist_pos[:, None, None],
                                    hand_pos[:, None, None], hand_radius)
            for i in range(3):
                t_kuka = jnp.minimum(
                    t_kuka, rc.sphere_hit(o_w, rays_w, tip_pos[:, None, None, i],
                                          tip_radius))
        else:
            t_kuka = jnp.full_like(t_table, rc.BIG)
        ts = jnp.stack([t_table, t_plug, t_sock, t_kuka])       # [4, N, H, W]
        comp = jnp.argmin(ts, axis=0)
        t_hit = jnp.min(ts, axis=0)
        hit = (t_hit > 0.0) & (t_hit < cfg.far - 1e-4)  # epilogue clips to near
        seg = jnp.where(
            hit, jnp.asarray([SEG_TABLE, SEG_PLUG, SEG_SOCKET, SEG_KUKA])[comp],
            SEG_TABLE,
        ).astype(jnp.int32)
        depth_norm, depth_raw = _depth_epilogue(cfg, t_hit, hit, noise_key)
        return depth_norm, seg, depth_raw

    if fused:
        from . import render_pallas as rp

        hw = cfg.height * cfg.width
        hw_pad = ((hw + rp.LANE - 1) // rp.LANE) * rp.LANE
        rays_flat = rays_c.reshape(hw, 3)
        if hw_pad > hw:
            pad = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (hw_pad - hw, 1))
            rays_flat = jnp.concatenate([rays_flat, pad], axis=0)
        cam_R = rot.quat_to_matrix(cam_q)                      # [3,3] or [N,3,3]
        if cam_R.ndim == 2:
            cam_R = jnp.broadcast_to(cam_R, (n, 3, 3))
        cam_tv = jnp.broadcast_to(cam_t, (n, 3)) if cam_t.ndim == 1 else cam_t
        M_plug = jnp.einsum("nij,njk->nik", rot.quat_to_matrix(inv_pq), cam_R)
        M_sock = jnp.einsum("nij,njk->nik", rot.quat_to_matrix(inv_sq), cam_R)
        tips_cam = wrist_cam = hand_cam = None
        if tip_pos is not None:
            # world → camera frame: c = Rᵀ(x − t); ray origin is 0 there
            to_cam = lambda x: jnp.einsum(
                "nji,nj->ni", cam_R, x - cam_tv) if x.ndim == 2 else jnp.einsum(
                "nji,nfj->nfi", cam_R, x - cam_tv[:, None])
            tips_cam = to_cam(tip_pos)
            wrist_cam = to_cam(wrist_pos)
            hand_cam = to_cam(hand_pos)
        t_hit, dmin, comp = rp.camera_march_fused(
            M_plug, o_plug, M_sock, o_sock, cam_R[:, 2, :], cam_tv[:, 2],
            kind_onehot, plug_hx, plug_hy, plug_length, hole_hx, hole_hy,
            socket_height, table_height, rays_flat,
            iters=cfg.march_iters, near=cfg.near, far=cfg.far,
            plate_hx=float(SOCKET_PLATE_HX), plate_hy=float(SOCKET_PLATE_HY),
            tips_cam=tips_cam, wrist_cam=wrist_cam, hand_cam=hand_cam,
            tip_radius=tip_radius, hand_radius=hand_radius,
            exact=(method == "exact"),
        )
        t_hit = t_hit[:, :hw].reshape(n, cfg.height, cfg.width)
        dmin = dmin[:, :hw].reshape(n, cfg.height, cfg.width)
        comp = comp[:, :hw].reshape(n, cfg.height, cfg.width)
        hit = (dmin < 2e-3) & (t_hit < cfg.far - 1e-4)
        seg = jnp.where(
            hit & (comp == 1.0), SEG_PLUG,
            jnp.where(hit & (comp == 2.0), SEG_SOCKET,
                      jnp.where(hit & (comp == 3.0), SEG_KUKA, SEG_TABLE)),
        ).astype(jnp.int32)
        depth_norm, depth_raw = _depth_epilogue(cfg, t_hit, hit, noise_key)
        return depth_norm, seg, depth_raw

    rays_w = (
        jnp.broadcast_to(rot.quat_apply(cam_q, rays_c), (n,) + rays_c.shape)
        if cam_q.ndim == 1
        else rot.quat_apply(cam_q[:, None, None, :], rays_c[None])
    )
    cam_t_b = cam_t if cam_t.ndim == 1 else cam_t[:, None, None, :]
    # hoist the per-frame ray directions out of the march loop (they are
    # t-independent; recomputing the quaternion applies every iteration
    # tripled the marcher's per-pixel math)
    rays_p = rot.quat_apply(inv_pq[:, None, None, :], rays_w)  # [N, H, W, 3]
    rays_s = rot.quat_apply(inv_sq[:, None, None, :], rays_w)

    def kuka_sdf(p_w):
        """Robot proxy: 3 fingertip spheres + wrist→hand capsule (world)."""
        if tip_pos is None:
            return jnp.full(p_w.shape[:-1], 1e3, p_w.dtype)
        d_tips = jnp.min(
            jnp.linalg.norm(p_w[..., None, :] - tip_pos[:, None, None], axis=-1),
            axis=-1,
        ) - tip_radius
        a = wrist_pos[:, None, None, :]
        ab = (hand_pos - wrist_pos)[:, None, None, :]
        ab2 = jnp.sum(ab * ab, -1, keepdims=True) + 1e-9
        h = jnp.clip(jnp.sum((p_w - a) * ab, -1, keepdims=True) / ab2, 0.0, 1.0)
        d_cap = jnp.linalg.norm(p_w - a - h * ab, axis=-1) - hand_radius
        return jnp.minimum(d_tips, d_cap)

    def scene_sdf(t):
        """Component distances at ray parameter t: [4, N, H, W]."""
        p_w = cam_t_b + rays_w * t[..., None]
        p_p = o_plug[:, None, None, :] + rays_p * t[..., None]
        p_s = o_sock[:, None, None, :] + rays_s * t[..., None]
        d_plug = sdfm.plug_sdf(
            p_p, kind_onehot[:, None, None, :], plug_hx[:, None, None],
            plug_hy[:, None, None], plug_length[:, None, None],
        )
        d_sock = sdfm.socket_sdf(
            p_s, kind_onehot[:, None, None, :], hole_hx[:, None, None],
            hole_hy[:, None, None], socket_height[:, None, None],
            jnp.asarray(SOCKET_PLATE_HX, t.dtype), jnp.asarray(SOCKET_PLATE_HY, t.dtype),
        )
        d_table = p_w[..., 2] - table_height[:, None, None]
        return jnp.stack([d_table, d_plug, d_sock, kuka_sdf(p_w)])

    def march(t, _):
        d = jnp.min(scene_sdf(t), axis=0)
        return jnp.minimum(t + jnp.maximum(d, 1e-4), cfg.far), None

    t0 = jnp.full((n, cfg.height, cfg.width), cfg.near)
    t_hit, _ = jax.lax.scan(march, t0, None, length=cfg.march_iters)

    d_comp = scene_sdf(t_hit)                                   # [4, N, H, W]
    comp = jnp.argmin(d_comp, axis=0)                           # table/plug/socket/kuka
    hit = (jnp.min(d_comp, axis=0) < 2e-3) & (t_hit < cfg.far - 1e-4)
    seg = jnp.where(
        hit, jnp.asarray([SEG_TABLE, SEG_PLUG, SEG_SOCKET, SEG_KUKA])[comp],
        SEG_TABLE
    ).astype(jnp.int32)

    depth_norm, depth_raw = _depth_epilogue(cfg, t_hit, hit, noise_key)
    return depth_norm, seg, depth_raw


def _depth_epilogue(cfg: CameraConfig, t_hit, hit, noise_key):
    """Depth noise/clip/normalize (DepthImageProcessor.process_depth_image
    parity, factory_utils.py:55-72); shared by the XLA and Pallas paths."""
    depth_raw = jnp.where(hit, t_hit, cfg.far)
    if noise_key is not None and cfg.dis_noise > 0.0:
        depth_raw = depth_raw + cfg.dis_noise * 2.0 * (
            jax.random.uniform(noise_key, depth_raw.shape) - 0.5
        )
    depth_clipped = jnp.clip(depth_raw, cfg.near, cfg.far)
    depth_norm = depth_clipped / -cfg.far
    return depth_norm, depth_raw


def seg_noise(seg: jax.Array, key: jax.Array, flip_prob: float = 0.1) -> jax.Array:
    """Random pixel-flip segmentation noise (factory_utils.py:23-37)."""
    k1, k2 = jax.random.split(key)
    flip = jax.random.uniform(k1, seg.shape) < flip_prob
    rand_ids = jax.random.randint(k2, seg.shape, 0, 4)
    return jnp.where(flip, rand_ids, seg)
