"""Deploy calibration (calib.py mirror) and scene/pose export parity."""

import dataclasses

import jax
import numpy as np

from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs import insertion
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()


def test_calibrate_deploy_scales_in_sim():
    """TPE calibration recovers usable deploy scales against SimInterface."""
    from isaacgyminsertion_tpu.deploy import SimInterface
    from isaacgyminsertion_tpu.deploy.calib import (
        calibrate_deploy_scales,
        replay_trajectory,
    )

    cfg = default_task_config()
    hw = SimInterface(cfg, seed=0)

    # synthesize a "recorded sim" trajectory by replaying constant actions
    # with the env's own metric scales (the ground-truth deploy scales)
    acts = np.tile(np.asarray([0.5, -0.3, -0.6, 0.0, 0.0, 0.0], np.float32), (8, 1))
    ref_trail = replay_trajectory(hw, acts, cfg.rl.pos_action_scale,
                                  cfg.rl.rot_action_scale)
    traj = {"actions": acts, "eef_pos": ref_trail,
            "eef_quat": np.tile(np.asarray([0, 0, 0, 1.0]), (8, 1))}

    best, loss, history = calibrate_deploy_scales(
        hw, [traj], n_trials=4, max_steps=8, seed=1
    )
    assert len(history) == 4
    assert set(best) == {"pos_scale_x", "pos_scale_y", "pos_scale_z",
                         "rot_scale_r", "rot_scale_p", "rot_scale_y"}
    assert np.isfinite(loss) and loss < 0.05  # trails within 5 cm on average


def test_scene_export_and_pose_extractor(tmp_path):
    from isaacgyminsertion_tpu.utils.scene_export import (
        PoseExtractor,
        export_scene_usda,
    )

    cfg = default_task_config()
    state = insertion.reset_all(cfg, MODEL, SUBS, jax.random.PRNGKey(0), 2)

    path = export_scene_usda(cfg, MODEL, SUBS, state, str(tmp_path / "scene.usda"))
    text = open(path).read()
    assert text.startswith("#usda 1.0")
    for prim in ("table", "socket", "plug"):
        assert f'"{prim}"' in text

    ex = PoseExtractor(MODEL)
    import jax.numpy as jnp

    step = jax.jit(lambda s: insertion.step(cfg, MODEL, SUBS, s, jnp.zeros((2, 6))))
    for _ in range(3):
        state, _ = step(state)
        ex.record(state)
    out = ex.save(str(tmp_path / "usd"))
    pos = np.load(f"{out}/body_position.npy")
    rotq = np.load(f"{out}/body_rotation.npy")
    assert pos.shape[0] == 3 and rotq.shape[0] == 3
    assert pos.shape[1] == rotq.shape[1]  # nb bodies + plug
    assert np.isfinite(pos).all() and np.isfinite(rotq).all()
