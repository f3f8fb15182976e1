"""Aux subsystems: determinism, data_io, tactile runner, video capture."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.utils.profiling import check_determinism

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()
CFG = default_task_config()


def test_env_step_is_deterministic():
    state = insertion.reset_all(CFG, MODEL, SUBS, jax.random.PRNGKey(0), 4)
    step = jax.jit(lambda s: insertion.step(CFG, MODEL, SUBS, s, jnp.zeros((4, 6))))
    assert check_determinism(step, state)


def test_data_io_roundtrip(tmp_path):
    from isaacgyminsertion_tpu.data.data_io import (
        cleanup_corrupt_files,
        inspect_trajectories,
        merge_grasp_datasets,
    )

    d = {
        "sub_idx": np.zeros(3, np.int32), "dof_pos": np.zeros((3, 15)),
        "socket_pos": np.zeros((3, 3)), "socket_quat": np.zeros((3, 4)),
        "plug_pos_hand": np.zeros((3, 3)), "plug_quat_hand": np.zeros((3, 4)),
    }
    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez_compressed(p1, **d)
    np.savez_compressed(p2, **d)
    n = merge_grasp_datasets([p1, p2], str(tmp_path / "m.npz"))
    assert n == 6
    # trajectory inspect + corrupt cleanup
    tdir = tmp_path / "trajs"
    tdir.mkdir()
    np.savez_compressed(tdir / "t0.npz", done_idx=np.asarray(5),
                        success=np.asarray([1.0]))
    (tdir / "bad.npz").write_bytes(b"not a zip")
    assert cleanup_corrupt_files(str(tdir)) == 1
    info = inspect_trajectories(str(tdir))
    assert info["num_trajectories"] == 1 and info["mean_length"] == 6


def test_tactile_regression_learns():
    from isaacgyminsertion_tpu.algo.tactile_runner import (
        TactileRegressionRunner,
        TactileRunnerConfig,
    )
    import tempfile

    rng = np.random.default_rng(0)
    tactile = rng.uniform(0, 1, (64, 3, 32, 32, 3)).astype(np.float32)
    targets = tactile.mean(axis=(1, 2, 3, 4), keepdims=False)[:, None] * np.ones((1, 7))
    with tempfile.TemporaryDirectory() as d:
        runner = TactileRegressionRunner(TactileRunnerConfig(epochs=8, batch_size=16), d)
        final = runner.fit(tactile.astype(np.float32), targets.astype(np.float32))
        assert np.isfinite(final) and final < 0.05


def test_video_capture(tmp_path):
    from isaacgyminsertion_tpu.utils.video import record_eval_video

    paths = record_eval_video(
        CFG, MODEL, SUBS, lambda s: jnp.zeros((1, 6)), n_steps=4,
        out_dir=str(tmp_path),
    )
    import os

    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_real_logger_records_deploy_rollout(tmp_path):
    import glob

    from isaacgyminsertion_tpu.data.logger import DataLoggerReal

    logger = DataLoggerReal(str(tmp_path), max_len=8)
    for t in range(5):
        logger.add_step({"obs": np.arange(15.0), "eef_pos": np.zeros(3)},
                        np.zeros(6), done=(t == 4))
    logger.close()
    files = glob.glob(str(tmp_path / "traj_*.npz"))
    assert len(files) == 1
    with np.load(files[0]) as d:
        assert d["actions"].shape == (5, 6)
        assert int(d["done_idx"]) == 4
        assert d["obs"].shape == (5, 15)
