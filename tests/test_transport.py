"""Deploy transport: codec interop + loopback hardware serving.

The remote HardwareInterface (deploy/transport.py) must be a drop-in for
SimInterface: a player driving RemoteInterface over TCP produces the same
hardware calls as driving the wrapped interface directly.
"""

import numpy as np

from isaacgyminsertion_tpu.deploy import transport as tr


def test_codec_roundtrip_all_dtypes():
    msg = {
        "f32": np.random.randn(3, 4).astype(np.float32),
        "f64": np.random.randn(2).astype(np.float64),
        "i32": np.arange(6, dtype=np.int32).reshape(2, 3),
        "i64": np.asarray([2**40], np.int64),
        "u8": np.arange(255, dtype=np.uint8),
        "flag": np.asarray([True, False]),
        "scalar": np.asarray(3.5, np.float32),
    }
    for codec in ("native", "python"):
        buf = tr.pack(msg) if codec == "native" else tr._py_pack(msg)
        for decoder in (tr.unpack, tr._py_unpack):
            out = decoder(buf)
            assert set(out) == set(msg)
            for k in msg:
                assert out[k].dtype == np.asarray(msg[k]).dtype, (codec, k)
                assert np.array_equal(out[k], msg[k]), (codec, k)


def test_native_codec_builds():
    # the C++ codec should build in this image (g++ present); if it truly
    # cannot, pack() falls back silently — make the build status visible
    lib = tr._load_native()
    assert lib is not None, "hwbridge.so failed to build"


def test_loopback_hardware_serving():
    class FakeHardware:
        """Records calls; echoes a deterministic observation."""

        def __init__(self):
            self.actions = []
            self.resets = 0

        def reset(self):
            self.resets += 1

        def get_observation(self):
            return {"eef_pos": np.asarray([0.5, 0.0, 0.2], np.float32),
                    "eef_quat": np.asarray([0, 0, 0, 1], np.float32),
                    "step": np.asarray(len(self.actions), np.int32)}

        def apply_action(self, delta_pos, delta_rot):
            self.actions.append((np.asarray(delta_pos), np.asarray(delta_rot)))

    hw = FakeHardware()
    thread = tr.serve_hardware(hw, port=7452, max_requests=20)
    try:
        remote = tr.RemoteInterface(port=7452)
        remote.reset()
        ob = remote.get_observation()
        assert np.allclose(ob["eef_pos"], [0.5, 0.0, 0.2])
        for i in range(3):
            remote.apply_action(np.asarray([0.001 * i, 0, 0]), np.zeros(3))
        ob2 = remote.get_observation()
        assert int(ob2["step"]) == 3
        assert hw.resets == 1
        assert len(hw.actions) == 3
        assert np.allclose(hw.actions[2][0], [0.002, 0, 0])
        remote.close()
    finally:
        thread.server.shutdown()


def test_player_runs_over_transport():
    """A deploy player drives the remote interface exactly like a local one
    (hardware_player.py players are transport-agnostic by Protocol)."""
    class CountingHardware:
        def __init__(self):
            self.n = 0

        def reset(self):
            pass

        def get_observation(self):
            return {"eef_pos": np.zeros(3, np.float32),
                    "eef_quat": np.asarray([0, 0, 0, 1], np.float32),
                    "socket_pos": np.asarray([0.5, 0, 0], np.float32)}

        def apply_action(self, delta_pos, delta_rot):
            self.n += 1

    hw = CountingHardware()
    thread = tr.serve_hardware(hw, port=7453, max_requests=50)
    try:
        remote = tr.RemoteInterface(port=7453)
        # a minimal deploy loop over the Protocol surface
        remote.reset()
        for _ in range(10):
            ob = remote.get_observation()
            delta = np.clip(ob["socket_pos"] - ob["eef_pos"], -0.01, 0.01)
            remote.apply_action(delta, np.zeros(3))
        assert hw.n == 10
        remote.close()
    finally:
        thread.server.shutdown()
