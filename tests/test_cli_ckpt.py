"""CLI override grammar + checkpoint roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.cli import parse_args
from isaacgyminsertion_tpu.utils.checkpoint import Checkpointer, restore_path


def test_cli_reference_key_names():
    a = parse_args([
        "task=FactoryTaskInsertionTactile", "train.algo=ExtrinsicAdapt",
        "task.env.numEnvs=4096", "train.ppo.horizon_length=32",
        "train.ppo.pcl_info=True", "task.external_cam.seg_cam=True",
        "checkpoint=foo/bar", "task.rl.max_episode_length=128",
        "task.randomize.domain_randomize=False",
    ])
    assert a["algo"] == "ExtrinsicAdapt"
    assert a["num_envs"] == 4096
    assert a["ppo"].horizon == 32
    assert a["dagger"].use_pcl is True
    assert a["task"].env.seg_cam is True
    assert a["checkpoint"] == "foo/bar"
    assert a["task"].rl.max_episode_length == 128
    assert a["task"].randomize.domain_randomize is False


def test_cli_direct_paths_and_errors():
    a = parse_args(["task.sim.substeps=5", "ppo.gamma=0.95", "dagger.horizon=16"])
    assert a["task"].sim.substeps == 5 and a["ppo"].gamma == 0.95
    assert a["dagger"].horizon == 16
    import pytest

    with pytest.raises(SystemExit):
        parse_args(["definitely.not.a.key=1"])


def test_checkpoint_roundtrip_and_best_rotation(tmp_path):
    ck = Checkpointer(str(tmp_path))
    from isaacgyminsertion_tpu.models.running_mean_std import rms_init

    tree = {"params": {"w": jnp.arange(4.0)}, "obs_rms": rms_init((3,))}
    ck.save_last(tree, step=7)
    back = restore_path(str(tmp_path / "last"))
    np.testing.assert_array_equal(back["params"]["w"], np.arange(4.0))
    assert back["obs_rms"].mean.shape == (3,)  # NamedTuple type preserved

    # first report establishes both bests
    assert ck.maybe_save_best(tree, reward=1.0, success=0.0) == ["best_reward", "best_success"]
    assert ck.maybe_save_best(tree, reward=0.5, success=0.2) == ["best_success"]
    assert ck.maybe_save_best(tree, reward=2.0, success=0.5) == ["best_reward", "best_success"]
    assert (tmp_path / "best_reward.ckpt").exists()
    assert (tmp_path / "best_success.ckpt").exists()
