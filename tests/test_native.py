"""Native C++ trajectory writer: build, roundtrip, throughput sanity."""

import glob
import os

import numpy as np
import pytest

from isaacgyminsertion_tpu.native import NativeTrajectoryWriter, load, read_trajectory


def test_native_writer_roundtrip(tmp_path):
    if load() is None:
        pytest.skip("toolchain unavailable")
    w = NativeTrajectoryWriter(str(tmp_path), num_workers=2)
    data = {
        "obs": np.random.randn(50, 15).astype(np.float32),
        "actions": np.random.randn(50, 6).astype(np.float32),
        "done_idx": np.asarray(49, np.int64),
        "flags": np.asarray([True, False]),
    }
    for _ in range(8):
        w.submit(data)
    w.close()
    files = sorted(glob.glob(str(tmp_path / "*.itraj")))
    assert len(files) == 8
    back = read_trajectory(files[0])
    for k, v in data.items():
        np.testing.assert_array_equal(np.asarray(back[k]).reshape(np.shape(v)), v)


def test_logger_uses_native_fast_path(tmp_path):
    from isaacgyminsertion_tpu.data.logger import DataLoggerSim

    lg = DataLoggerSim(str(tmp_path), num_envs=2, total_trajectories=4)
    chunk = {
        "obs": np.random.randn(6, 2, 15).astype(np.float32),
        "actions": np.random.randn(6, 2, 6).astype(np.float32),
        "done": np.asarray([[0, 0], [0, 1], [0, 0], [1, 0], [0, 1], [1, 1]], bool),
    }
    lg.add_chunk(chunk)
    lg.close()
    files = os.listdir(tmp_path)
    assert any(f.endswith((".npz", ".itraj")) for f in files)
