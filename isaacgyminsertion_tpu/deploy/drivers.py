"""Hardware driver examples behind the `deploy.devices` seam.

The kinematic devices in `devices.py` prove the *architecture* (polled
drivers + CompositeEnv + transport); this module proves the *seam*: each
class here is a real-driver implementation that talks to actual hardware
SDKs, import-guarded so the framework runs (and tests) without them
installed. Reference shapes:

- `ZedCamera`        ← algo/deploy/env/zed_camera.py (ROS-topic ZED depth
  subscriber, 320×180, clip [0.1, 0.5] m) — here via the ZED SDK (pyzed)
  directly instead of a ROS relay.
- `SerialOpenhand`   ← algo/deploy/env/openhand_env.py + hand.py (Dynamixel
  servos behind /gripper/pos, /gripper/load topics and TargetAngles
  services) — here via the dynamixel_sdk / pyserial port directly.
- `UsbAllsight`      ← algo/deploy/env/finger.py (cv2.VideoCapture fingertip
  cameras with a circle mask and background differencing).

Every class subclasses its `devices.py` abstract and only overrides the
driver hooks (`_read`, command methods), so `CompositeEnv(arm=..., hand=
SerialOpenhand(...), camera=ZedCamera(...))` is a drop-in robot: nothing
above the device layer changes, which is the "same config tree drives sim
and robot" property the reference keeps (SURVEY §8.4).

Each constructor raises `DriverUnavailable` if its SDK is missing, so
callers can fall back to the kinematic devices explicitly.
"""

from __future__ import annotations

import time

import numpy as np

from .devices import CameraDevice, HandDevice, TactileDevice


class DriverUnavailable(RuntimeError):
    """The hardware SDK this driver needs is not importable on this host."""


def _resize_nn(img: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (numpy-only; avoids a cv2 dependency on the
    ZED path). Sensor frames are small (≤320×180 → 96×54)."""
    h, w = shape
    ys = (np.arange(h) * (img.shape[0] / h)).astype(np.int64)
    xs = (np.arange(w) * (img.shape[1] / w)).astype(np.int64)
    return np.ascontiguousarray(img[ys][:, xs])


# --------------------------------------------------------------------------- #
# ZED depth (+ neural seg hook) camera
# --------------------------------------------------------------------------- #


class ZedCamera(CameraDevice):
    """ZED stereo camera through the ZED SDK (pyzed.sl).

    Produces the reference pipeline's camera contract
    (zed_camera.py:16-21 + DepthImageProcessor, factory_utils.py:55-72):
    depth in meters clipped to [near_clip, far_clip] then normalized to
    [0, 1], resized to the training resolution, plus a segmentation channel.
    Segmentation on hardware comes from a separate tracker (the reference
    runs SAM in seg_camera.py); pass `seg_fn(rgb) -> [H, W] ids` to plug one
    in, else seg is all-zero (background id).
    """

    def __init__(self, shape=(54, 96), rate_hz: float = 30.0,
                 near_clip: float = 0.1, far_clip: float = 0.5,
                 seg_fn=None, camera_fps: int = 30):
        try:
            import pyzed.sl as sl  # ZED SDK python bindings
        except ImportError as e:  # pragma: no cover - requires ZED SDK
            raise DriverUnavailable("pyzed (ZED SDK) not installed") from e
        super().__init__(shape=shape, rate_hz=rate_hz)
        self._sl = sl
        self.near_clip, self.far_clip = near_clip, far_clip
        self.seg_fn = seg_fn
        self.zed = sl.Camera()
        init = sl.InitParameters()
        init.camera_resolution = sl.RESOLUTION.VGA
        init.camera_fps = camera_fps
        init.depth_mode = sl.DEPTH_MODE.NEURAL
        init.coordinate_units = sl.UNIT.METER
        init.depth_minimum_distance = near_clip
        status = self.zed.open(init)
        if status != sl.ERROR_CODE.SUCCESS:  # pragma: no cover - hardware
            raise DriverUnavailable(f"ZED open failed: {status}")
        self._depth = sl.Mat()
        self._rgb = sl.Mat()
        self._runtime = sl.RuntimeParameters()

    def _read(self) -> dict | None:  # pragma: no cover - requires hardware
        sl = self._sl
        if self.zed.grab(self._runtime) != sl.ERROR_CODE.SUCCESS:
            return None  # keep last sample; the staleness watchdog flags death
        self.zed.retrieve_measure(self._depth, sl.MEASURE.DEPTH)
        depth = np.asarray(self._depth.get_data(), np.float32)
        # DepthImageProcessor parity: NaN/inf → far, clip, normalize to [0,1]
        depth = np.nan_to_num(depth, nan=self.far_clip, posinf=self.far_clip,
                              neginf=self.near_clip)
        depth = np.clip(depth, self.near_clip, self.far_clip)
        depth = (depth - self.near_clip) / (self.far_clip - self.near_clip)
        depth = _resize_nn(depth, self.shape)
        if self.seg_fn is not None:
            self.zed.retrieve_image(self._rgb, sl.VIEW.LEFT)
            rgb = np.asarray(self._rgb.get_data())[..., :3]
            seg = _resize_nn(np.asarray(self.seg_fn(rgb), np.float32), self.shape)
        else:
            seg = np.zeros(self.shape, np.float32)
        return {"img": depth, "seg": seg}

    def stop(self):  # release the camera handle with the polling thread
        super().stop()
        try:  # pragma: no cover - requires hardware
            self.zed.close()
        except Exception:
            pass


# --------------------------------------------------------------------------- #
# OpenHand over Dynamixel serial
# --------------------------------------------------------------------------- #

# Dynamixel XM-series control table (protocol 2.0)
_ADDR_TORQUE_ENABLE = 64
_ADDR_GOAL_POSITION = 116
_ADDR_PRESENT_POSITION = 132
_ADDR_PRESENT_LOAD = 126
_TICKS_PER_RAD = 4096.0 / (2.0 * np.pi)


class SerialOpenhand(HandDevice):
    """OpenHand Model-O style 3-finger hand on a Dynamixel bus.

    The reference drives this through hand_control ROS services
    (openhand_env.py: TargetAngles/close services, /gripper/pos + /gripper/load
    topics); here the same motor surface is the dynamixel_sdk directly. The
    8-dim gripper vector and the normalized motor-state convention are
    inherited from HandDevice, so CompositeEnv.get_hand_motor_state() is
    unchanged.
    """

    def __init__(self, port: str = "/dev/ttyUSB0", baud: int = 57600,
                 motor_ids=(1, 2, 3, 4), oh=None, rate_hz: float = 60.0,
                 load_limit: float = 0.6):
        try:
            from dynamixel_sdk import PacketHandler, PortHandler
        except ImportError as e:  # pragma: no cover - requires SDK
            raise DriverUnavailable("dynamixel_sdk not installed") from e
        super().__init__(oh=oh, rate_hz=rate_hz)
        self.motor_ids = tuple(motor_ids)
        self.load_limit = load_limit
        self.port = PortHandler(port)
        self.packet = PacketHandler(2.0)
        if not self.port.openPort() or not self.port.setBaudRate(baud):
            raise DriverUnavailable(f"cannot open Dynamixel bus on {port}")
        for mid in self.motor_ids:  # pragma: no cover - requires hardware
            self.packet.write1ByteTxRx(self.port, mid, _ADDR_TORQUE_ENABLE, 1)

    # motor mapping: 4 servos → 8-dim gripper vector. Model-O couples each
    # finger's proximal+distal through one tendon servo; servo 0 is the
    # base/spread. The sim-side vector is [base, (prox, dist) × 3, spread].
    def _servo_to_vec(self, ticks: np.ndarray) -> np.ndarray:
        rad = ticks / _TICKS_PER_RAD
        o = self.oh
        vec = np.empty(8, np.float32)
        vec[0] = o.base_angle
        for f in range(3):
            t = rad[1 + f]
            vec[1 + 2 * f] = o.proximal_open + t          # proximal tracks tendon
            vec[2 + 2 * f] = o.distal_open + 0.4 * t      # distal lags (tendon ratio)
        vec[7] = rad[0]
        return vec

    def _vec_to_servo(self, vec: np.ndarray) -> np.ndarray:
        o = self.oh
        ticks = np.empty(len(self.motor_ids), np.float32)
        ticks[0] = vec[7] * _TICKS_PER_RAD
        for f in range(3):
            ticks[1 + f] = (vec[1 + 2 * f] - o.proximal_open) * _TICKS_PER_RAD
        return ticks

    def _read(self) -> dict:  # pragma: no cover - requires hardware
        ticks = np.zeros(len(self.motor_ids), np.float32)
        loads = np.zeros(len(self.motor_ids), np.float32)
        for i, mid in enumerate(self.motor_ids):
            pos, rc, err = self.packet.read4ByteTxRx(
                self.port, mid, _ADDR_PRESENT_POSITION)
            load, _, _ = self.packet.read2ByteTxRx(
                self.port, mid, _ADDR_PRESENT_LOAD)
            if rc != 0 or err != 0:
                return None  # bus hiccup: keep last sample
            ticks[i] = pos
            loads[i] = np.int16(load) / 1000.0  # signed percent of stall
        self._q = self._servo_to_vec(ticks)
        return {"motors": self._q.copy(), "load": loads}

    def _command(self, q: np.ndarray):  # pragma: no cover - requires hardware
        self._q = np.asarray(q, np.float32).copy()
        ticks = self._vec_to_servo(self._q)
        for mid, t in zip(self.motor_ids, ticks):
            self.packet.write4ByteTxRx(self.port, mid, _ADDR_GOAL_POSITION,
                                       int(t))

    def grasp(self, staged: bool = True, stages: int = 10):
        """Staged close with a load abort: stop tightening once any tendon
        load passes load_limit (the reference's close service watches
        /gripper/load the same way)."""
        if not staged:  # pragma: no cover - requires hardware
            self._command(self._close)
            return
        for i in range(1, stages + 1):  # pragma: no cover - requires hardware
            s = self.latest()
            if s is not None and "load" in s and np.any(
                    np.abs(s["load"]) > self.load_limit):
                break
            self._command(self._open + (self._close - self._open) * (i / stages))
            time.sleep(1.0 / self.rate_hz)

    def stop(self):
        super().stop()
        try:  # pragma: no cover - requires hardware
            for mid in self.motor_ids:
                self.packet.write1ByteTxRx(self.port, mid, _ADDR_TORQUE_ENABLE, 0)
            self.port.closePort()
        except Exception:
            pass


# --------------------------------------------------------------------------- #
# AllSight fingertip cameras over USB/UVC
# --------------------------------------------------------------------------- #


class UsbAllsight(TactileDevice):
    """3 AllSight fingertip cameras as UVC devices (finger.py analog).

    Applies the sensor-side half of the sim tactile pipeline so hardware
    frames match the training distribution (factory_task_insertion.py:546-574
    + allsight_render.py:214-219): circle mask, background difference
    against a calibration frame, resize to the encoder size, [0, 1] range.
    """

    def __init__(self, device_indices=(0, 1, 2), shape=(3, 64, 64, 3),
                 rate_hz: float = 30.0, diff_with_bg: bool = True):
        try:
            import cv2
        except ImportError as e:  # pragma: no cover
            raise DriverUnavailable("opencv (cv2) not installed") from e
        super().__init__(shape=shape, rate_hz=rate_hz)
        self._cv2 = cv2
        self.diff_with_bg = diff_with_bg
        self.caps = []
        for idx in device_indices:
            cap = cv2.VideoCapture(idx)
            if not cap.isOpened():
                for c in self.caps:
                    c.release()
                raise DriverUnavailable(f"tactile camera {idx} not available")
            self.caps.append(cap)
        self._bg = None  # calibration frames, captured on first read
        h, w = self.shape[1], self.shape[2]
        yy, xx = np.mgrid[0:h, 0:w]
        r = min(h, w) / 2.0
        self._mask = ((yy - h / 2.0) ** 2 + (xx - w / 2.0) ** 2
                      <= r * r).astype(np.float32)[..., None]

    def _grab(self) -> np.ndarray | None:  # pragma: no cover - hardware
        frames = []
        for cap in self.caps:
            ok, frame = cap.read()
            if not ok:
                return None
            frame = self._cv2.resize(frame, (self.shape[2], self.shape[1]))
            frames.append(frame[..., ::-1].astype(np.float32) / 255.0)  # BGR→RGB
        return np.stack(frames)

    def calibrate(self, n_frames: int = 10) -> bool:  # pragma: no cover - hw
        """Capture an explicit contact-free background (mean of n_frames),
        like the reference's background-calibration step (allsight_wrapper
        _calibrate). Call BEFORE the hand makes contact; falling back to the
        first polled frame bakes any startup contact into the background
        (round-3 ADVICE)."""
        acc = []
        for _ in range(n_frames):
            raw = self._grab()
            if raw is not None:
                acc.append(raw)
        if not acc:
            return False
        self._bg = np.mean(acc, axis=0)
        return True

    def _read(self) -> dict:  # pragma: no cover - requires hardware
        raw = self._grab()
        if raw is None:
            return None
        if self._bg is None:
            # last-resort background (no explicit calibrate() call); valid
            # only if the gel is contact-free at startup
            self._bg = raw.copy()
        out = raw - self._bg if self.diff_with_bg else raw
        out = np.clip(out * 0.5 + 0.5, 0.0, 1.0) if self.diff_with_bg else out
        return {"frames": out * self._mask}

    def stop(self):
        super().stop()
        for cap in self.caps:  # pragma: no cover - requires hardware
            try:
                cap.release()
            except Exception:
                pass
