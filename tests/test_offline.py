"""Offline pipeline: collect teacher rollouts → dataset → offline training."""

import glob

import jax
import numpy as np

from isaacgyminsertion_tpu.algo import ppo as ppo_mod
from isaacgyminsertion_tpu.algo.collect import collect_teacher_rollouts
from isaacgyminsertion_tpu.algo.offline_runner import OfflineConfig, OfflineRunner
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.data.dataset import DataNormalizer, TrajectoryDataset
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
import dataclasses

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()


def test_collect_then_offline_train(tmp_path):
    cfg0 = default_task_config()
    cfg = cfg0.replace(rl=dataclasses.replace(cfg0.rl, max_episode_length=12))
    net, tx, pstate, _ = ppo_mod.build(
        cfg, ppo_mod.PPOConfig(horizon=4, mini_epochs=2), MODEL, SUBS, 4,
        jax.random.PRNGKey(0),
    )
    data_dir = str(tmp_path / "trajs")
    n = collect_teacher_rollouts(
        cfg, MODEL, SUBS, net, pstate.params, pstate.obs_rms, pstate.priv_rms,
        n_envs=4, out_dir=data_dir, total_trajectories=6, chunk=13,
    )
    from isaacgyminsertion_tpu.data.dataset import list_trajectory_files, open_traj

    files = list_trajectory_files(data_dir)
    assert len(files) >= 6
    with open_traj(files[0]) as d:
        assert "student_obs" in d and "actions" in d and "latent" in d
        assert d["student_obs"].shape[-1] == 15 and d["actions"].shape[-1] == 6
        assert int(np.asarray(d["done_idx"]).ravel()[0]) >= 1

    stats = DataNormalizer(data_dir).run()
    assert "student_obs" in stats
    ds = TrajectoryDataset(data_dir, normalizer=DataNormalizer(data_dir))
    assert len(ds) > 10

    runner = OfflineRunner(
        OfflineConfig(epochs=2, batch_size=16), data_dir, str(tmp_path / "out")
    )
    metrics = runner.run()
    assert np.isfinite(metrics["train/loss"]) and np.isfinite(metrics["val/loss"])


def test_multimodal_collect_then_offline_train(tmp_path):
    """tactile+pcl student trained offline from collected npz with a
    trajectory-level held-out validation split (runner.py:150-304 parity)."""
    cfg0 = default_task_config()
    cfg = cfg0.replace(
        rl=dataclasses.replace(cfg0.rl, max_episode_length=10),
        env=dataclasses.replace(
            cfg0.env, tactile=True, external_cam=True, pcl_cam=True,
            seg_cam=True, total_points=64, num_points=24, num_points_socket=24,
            num_points_goal=0,
        ),
    )
    net, tx, pstate, _ = ppo_mod.build(
        cfg, ppo_mod.PPOConfig(horizon=4, mini_epochs=2), MODEL, SUBS, 2,
        jax.random.PRNGKey(0),
    )
    data_dir = str(tmp_path / "trajs")
    collect_teacher_rollouts(
        cfg, MODEL, SUBS, net, pstate.params, pstate.obs_rms, pstate.priv_rms,
        n_envs=2, out_dir=data_dir, total_trajectories=5, chunk=11,
    )
    from isaacgyminsertion_tpu.data.dataset import list_trajectory_files, open_traj

    files = list_trajectory_files(data_dir)
    with open_traj(files[0]) as d:
        assert "tactile" in d and "pcl" in d and "seg" in d
        assert d["pcl"].shape[-1] == 3

    ocfg = OfflineConfig(epochs=2, batch_size=8, use_tactile=True, use_pcl=True,
                         use_seg=True, val_fraction=0.25)
    runner = OfflineRunner(ocfg, data_dir, str(tmp_path / "out"))
    metrics = runner.run()
    assert np.isfinite(metrics["train/loss"])
    assert np.isfinite(metrics["val/loss"])  # held-out trajectories exist
    # the val split is disjoint from train by trajectory
    train_set = set(runner.dataset.files)
    val_set = set(runner.val_dataset.files)
    assert train_set and val_set and not (train_set & val_set)


def test_offline_replay_eval(tmp_path):
    """offline_training_w_env parity (reference train.py:124-128): the
    offline-trained student replays against the live env and returns a
    success rate under the eval convention (resets disabled)."""
    cfg0 = default_task_config()
    cfg = cfg0.replace(
        rl=dataclasses.replace(cfg0.rl, max_episode_length=8),
        env=dataclasses.replace(
            cfg0.env, external_cam=True, pcl_cam=True, seg_cam=True,
            total_points=64, num_points=24, num_points_socket=24,
            num_points_goal=0,
        ),
    )
    net, tx, pstate, _ = ppo_mod.build(
        cfg, ppo_mod.PPOConfig(horizon=4, mini_epochs=2), MODEL, SUBS, 2,
        jax.random.PRNGKey(0),
    )
    data_dir = str(tmp_path / "trajs")
    collect_teacher_rollouts(
        cfg, MODEL, SUBS, net, pstate.params, pstate.obs_rms, pstate.priv_rms,
        n_envs=2, out_dir=data_dir, total_trajectories=3, chunk=9,
    )
    ocfg = OfflineConfig(epochs=1, batch_size=8, only_bc=True, use_pcl=True,
                         use_seg=True, val_fraction=0.0)
    runner = OfflineRunner(ocfg, data_dir, str(tmp_path / "out"))
    runner.run()
    sr = runner.replay_eval(cfg, n_envs=2, seed=0)
    assert 0.0 <= sr <= 1.0
