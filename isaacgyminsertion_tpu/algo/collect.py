"""Teacher rollout data collection → npz trajectory datasets.

Parity: scripts/collect_s1.sh + data_logger block (FactoryTaskInsertionTactile
.yaml data_logger, experience.py DataLoggerSim): roll the frozen teacher in
sim and log per-env trajectories (obs/student_obs/priv/actions/teacher latent/
poses/done) for offline student training. Rollouts run in jitted chunks; the
logger consumes host copies at chunk boundaries only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.logger import DataLoggerSim
from ..envs import insertion
from ..models.running_mean_std import rms_normalize
from ..physics.kinematics import forward_kinematics, site_pose
from ..physics.robot import SITE_FINGERTIP_CENTERED


def collect_teacher_rollouts(
    cfg_task, model, subs, net, params, obs_rms, priv_rms,
    n_envs: int, out_dir: str, total_trajectories: int = 100,
    chunk: int = 32, seed: int = 0, deterministic: bool = True,
):
    def chunk_fn(env_state, rng):
        def body(carry, _):
            env_state, rng = carry
            rng, k = jax.random.split(rng)
            obs = env_state.obs_queue
            stud_obs = env_state.obs_stud_queue
            priv = insertion.priv_info_of(cfg_task, model, env_state)
            o = rms_normalize(obs_rms, obs)
            p = rms_normalize(priv_rms, priv)
            mu, log_std, _, latent, _ = net.apply(params, o, p)
            act = mu if deterministic else mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            act = jnp.clip(act, -1.0, 1.0)
            fk = forward_kinematics(model, env_state.phys.q)
            eef_q, eef_t = site_pose(model, fk, SITE_FINGERTIP_CENTERED)
            env_state, out = insertion.step(cfg_task, model, subs, env_state, act)
            rec = dict(
                obs=obs, student_obs=stud_obs, priv_info=priv, actions=act,
                rewards=out.rew, latent=latent, done=out.reset,
                success=out.extras["successes"],
                plug_pos=env_state.phys.plug_pos, plug_quat=env_state.phys.plug_quat,
                socket_pos=env_state.params.socket_pos,
                socket_quat=env_state.params.socket_quat,
                eef_pos=eef_t, eef_quat=eef_q,
            )
            # sensor side arrays for multimodal offline training (reference
            # stores tactile in per-step side folders + img/seg in the obs
            # npz, data.py:337-374); newest queue slot, f16 to halve disk
            if cfg_task.env.tactile:
                rec["tactile"] = out.tactile[:, 0].astype(jnp.float16)
            if cfg_task.env.depth_cam:
                rec["img"] = out.img[:, 0].astype(jnp.float16)
            if cfg_task.env.seg_cam:
                rec["seg"] = out.seg[:, 0].astype(jnp.int8)
            if cfg_task.env.pcl_cam:
                rec["pcl"] = out.pcl[:, 0].astype(jnp.float16)
            return (env_state, rng), rec

        (env_state, rng), recs = jax.lax.scan(body, (env_state, rng), None, length=chunk)
        return env_state, rng, recs

    chunk_jit = jax.jit(chunk_fn)
    rng = jax.random.PRNGKey(seed)
    env_state = insertion.reset_all(cfg_task, model, subs, rng, n_envs)
    logger = DataLoggerSim(out_dir, n_envs, total_trajectories=total_trajectories)
    while not logger.done:
        env_state, rng, recs = chunk_jit(env_state, rng)
        logger.add_chunk({k: np.asarray(v) for k, v in recs.items()})
    logger.close()
    # manifest: the generation is deterministic in (seed, n_envs, config), so
    # a lost dataset is exactly reproducible from this record (VERDICT r4
    # item 4: traj_r3 vanished with outputs/ and nothing pinned how to
    # regenerate it)
    import json
    import os

    manifest = dict(
        seed=seed, n_envs=n_envs, deterministic=deterministic, chunk=chunk,
        total_trajectories=total_trajectories, count=logger.writer.count,
        modalities=dict(tactile=cfg_task.env.tactile,
                        depth=cfg_task.env.depth_cam,
                        seg=cfg_task.env.seg_cam, pcl=cfg_task.env.pcl_cam),
        files=sorted(f for f in os.listdir(out_dir) if f.endswith(".npz")),
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return logger.writer.count


def collect_rotating_plug(
    cfg_task, model, subs, n_envs: int, out_path: str, n_steps: int = 60,
    rot_per_step: float = 0.05, seed: int = 0,
):
    """Plug-rotation tactile data collection (collect_rotate mode parity,
    factory_task_insertion.py:1520-1589 `rotate_plug`): spin the grasped plug
    about its axis in-hand and log tactile frames + in-hand poses — the
    dataset behind the tactile pose-regressor (algo/tactile_runner.py)."""
    import dataclasses

    import jax.numpy as jnp

    from ..ops import rotations as rot
    from ..sensors.tactile import TactileConfig, render_tactile
    from ..physics.engine import fingertip_poses
    from ..physics.kinematics import forward_kinematics

    cfg = cfg_task.replace(env=dataclasses.replace(cfg_task.env, tactile=True))
    env_state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(seed), n_envs)
    tcfg = TactileConfig()

    def frame(env_state, angle):
        phys = env_state.phys
        dq = rot.quat_from_angle_axis(jnp.full((n_envs,), angle),
                                      jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_envs, 1)))
        plug_q = rot.quat_mul(dq, phys.plug_quat)
        fk = forward_kinematics(model, phys.q)
        tip_q, tip_t = fingertip_poses(model, fk)
        img = render_tactile(
            tcfg, tip_q, tip_t, plug_q, phys.plug_pos,
            env_state.params.kind_onehot, env_state.params.plug_hx,
            env_state.params.plug_hy, env_state.params.plug_length,
            force=jnp.full((n_envs, 3), 5.0),
        )
        return img, plug_q

    frame_jit = jax.jit(frame)
    tactile, quats = [], []
    for t in range(n_steps):
        img, q = frame_jit(env_state, rot_per_step * t)
        tactile.append(np.asarray(img))
        quats.append(np.asarray(q))
    np.savez_compressed(out_path, tactile=np.stack(tactile, 1),
                        plug_quat=np.stack(quats, 1),
                        plug_pos=np.asarray(env_state.phys.plug_pos))
    return n_steps * n_envs
