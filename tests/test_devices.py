"""Robot-side device layer tests (deploy/devices.py): polling freshness,
kinematic arm servo + safety envelope, ExperimentEnv-mirror surface, and the
composite env published through the TCP transport to a RemoteInterface —
the full robot-side stack with zero hardware (reference algo/deploy/env/*
has no test counterpart; this is the pyramid SURVEY §4 calls for)."""

import threading
import time

import numpy as np
import pytest

from isaacgyminsertion_tpu.deploy.devices import (
    CompositeEnv,
    CompositeEnvConfig,
    Device,
    HandDevice,
    KinematicArm,
    SafetyLimits,
    TactileDevice,
    TrackerDevice,
)


class CountingDevice(Device):
    def __init__(self):
        super().__init__(rate_hz=200.0, name="count")
        self.n = 0

    def _read(self):
        self.n += 1
        return {"n": np.int64(self.n)}


def test_device_polls_and_detects_staleness():
    d = CountingDevice()
    assert d.start()
    assert d.init_success
    time.sleep(0.05)
    s = d.latest(max_age=0.5)
    assert s is not None and int(s["n"]) >= 1
    d.stop()
    time.sleep(0.02)
    assert d.latest(max_age=0.01) is None  # stopped → stale
    assert d.latest() is not None          # but the last sample is retained


def test_kinematic_arm_servo_moves_ee():
    arm = KinematicArm()
    assert arm.start()
    p0 = arm.latest()["ee_pos"].copy()
    for _ in range(5):
        arm.servo_delta(np.array([0.002, 0.0, 0.0], np.float32), np.zeros(3, np.float32))
    p1 = arm._read()["ee_pos"]
    assert p1[0] - p0[0] > 0.005  # moved in +x, dls IK tracks most of 10 mm
    assert abs(p1[1] - p0[1]) < 2e-3 and abs(p1[2] - p0[2]) < 2e-3
    arm.stop()


def test_hand_staged_grasp_and_motor_state():
    h = HandDevice()
    h.rate_hz = 1000.0  # fast stages in test
    assert h.start()
    assert np.allclose(h.motor_state(), 0.0, atol=1e-6)
    h.grasp(staged=True, stages=4)
    ms = h.motor_state()
    assert np.allclose(ms[1:7], 1.0, atol=1e-6)  # finger rows fully closed
    assert not np.allclose(h.motor_state(normalized=False)[1:7],
                           h._open[1:7])
    h.release()
    assert np.allclose(h.motor_state(), 0.0, atol=1e-6)
    h.stop()


def test_safety_clamps_and_wrench_fault():
    lim = SafetyLimits(max_dpos=0.002, max_drot=0.01)
    dpos, drot = lim.clamp(np.array([0.5, 0.0, 0.1]), np.array([0.05, 0, 0]),
                           np.array([0.5, 0, 0]))
    assert abs(dpos[0] - 0.002) < 1e-9 and abs(drot[0] - 0.01) < 1e-9
    # workspace wall: at x = hi the +x delta collapses to 0
    dpos, _ = lim.clamp(np.array([0.8, 0.0, 0.1]), np.array([0.002, 0, 0]),
                        np.zeros(3))
    assert abs(dpos[0]) < 1e-9

    env = CompositeEnv(CompositeEnvConfig(with_hand=False))
    assert env.ready
    env.arm._wrench = np.array([100.0, 0, 0, 0, 0, 0], np.float32)
    time.sleep(0.05)  # let the poller pick up the spike
    env.apply_action(np.array([0.001, 0, 0]), np.zeros(3))
    assert env.fault
    q_after = env.arm._read()["joints"].copy()
    env.apply_action(np.array([0.001, 0, 0]), np.zeros(3))  # latched: ignored
    assert np.allclose(env.arm._read()["joints"], q_after)
    env.close()


def test_composite_env_mirrors_experiment_env():
    env = CompositeEnv(CompositeEnvConfig(
        with_tactile=True, with_ext_cam=True, with_depth=True, with_pcl=True))
    assert env.ready
    env.reset()
    ob = env.get_observation()
    e = env.task_cfg.env
    assert ob["obs"].shape == (e.num_obs_hist * e.num_observations,)
    assert ob["tactile"].shape[1] == 3 and ob["img"].ndim == 3
    assert ob["pcl"].shape[-1] == 3 and ob["ft"].shape == (6,)
    left, right, bottom = env.get_frames()
    assert left.shape == right.shape == bottom.shape
    info = env.get_info_for_control()
    assert info["jacob"].shape == (6, 7) and info["ee_pose"].shape == (7,)
    sp, sq = env.tracker.object_pose()
    assert sp.shape == (3,) and sq.shape == (4,)
    # obs vector carries the applied action at the next read
    env.apply_action(np.array([0.001, 0.0, 0.0]), np.zeros(3))
    ob2 = env.get_observation()
    assert abs(ob2["obs"][9] - 0.001) < 1e-6
    env.close()


def test_composite_env_over_transport():
    from isaacgyminsertion_tpu.deploy.transport import RemoteInterface, serve_hardware

    env = CompositeEnv(CompositeEnvConfig(with_tactile=True))
    thread = serve_hardware(env, port=0)
    srv = thread.server
    try:
        hw = RemoteInterface(port=srv.server_address[1])
        hw.reset()
        ob = hw.get_observation()
        assert ob["obs"].shape[-1] == env.task_cfg.env.num_observations
        p0 = env.arm._read()["ee_pos"].copy()
        for _ in range(3):
            hw.apply_action(np.array([0.002, 0, 0], np.float32),
                            np.zeros(3, np.float32))
        p1 = env.arm._read()["ee_pos"]
        assert p1[0] > p0[0]
        hw.close()
    finally:
        srv.shutdown()
        env.close()


def test_real_driver_examples_guarded_and_mapped():
    """deploy/drivers.py: real-SDK drivers raise DriverUnavailable cleanly
    when their SDK is absent (this CI host has none), and the Dynamixel
    servo<->gripper-vector mapping round-trips on the tendon-driven dofs."""
    import pytest

    from isaacgyminsertion_tpu.deploy import drivers
    from isaacgyminsertion_tpu.envs.config import OpenhandConfig

    for cls, kwargs in ((drivers.ZedCamera, {}),
                        (drivers.SerialOpenhand, {}),
                        (drivers.UsbAllsight, {})):
        with pytest.raises(drivers.DriverUnavailable):
            cls(**kwargs)

    # mapping consistency without a serial bus: construct bare and exercise
    # the pure converters
    h = object.__new__(drivers.SerialOpenhand)
    h.oh = OpenhandConfig()
    h.motor_ids = (1, 2, 3, 4)
    o = h.oh
    vec = np.array([o.base_angle,
                    o.proximal_open + 0.3, o.distal_open + 0.12,
                    o.proximal_open + 0.2, o.distal_open + 0.08,
                    o.proximal_open + 0.1, o.distal_open + 0.04,
                    0.05], np.float32)
    back = h._servo_to_vec(h._vec_to_servo(vec))
    # proximal + spread round-trip exactly; distal follows the tendon ratio
    np.testing.assert_allclose(back[[1, 3, 5, 7]], vec[[1, 3, 5, 7]], atol=1e-5)
    np.testing.assert_allclose(back[[2, 4, 6]], vec[[2, 4, 6]], atol=1e-5)

    # numpy-only resize used by the ZED depth path
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = drivers._resize_nn(img, (2, 2))
    assert out.shape == (2, 2)
