"""Real-SDK driver logic that is testable without hardware.

- ApriltagTracker: full round-trip on a SYNTHETIC tag image (cv2.aruco
  renders the marker, the driver must recover the known pose) — validates
  the solvePnP + extrinsic math, not just the plumbing.
- EkiIiwaArm: XML wire-format round-trip + one transaction against a
  loopback fake controller socket.
"""

import socket
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from isaacgyminsertion_tpu.deploy.drivers import ApriltagTracker, EkiIiwaArm


def _render_tag(K, tag_size, cam_from_tag_t, px=900):
    """Render tag 0 at a known camera-frame pose (fronto-parallel at depth z)
    by projecting its corners with the SAME intrinsics the tracker uses."""
    marker = cv2.aruco.generateImageMarker(
        cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11), 0, 200)
    img = np.full((px, px), 255, np.uint8)
    s = tag_size / 2.0
    corners_tag = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                           np.float64)
    pts = corners_tag + cam_from_tag_t  # R = I (fronto-parallel)
    uv = (K @ pts.T).T
    uv = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
    src = np.array([[0, 0], [200, 0], [200, 200], [0, 200]], np.float32)
    H, _ = cv2.findHomography(src, uv)
    warped = cv2.warpPerspective(marker, H, (px, px), flags=cv2.INTER_NEAREST,
                                 borderValue=255)
    img = np.minimum(img, warped)
    return img


def test_apriltag_tracker_recovers_known_pose():
    fx = fy = 800.0
    cx = cy = 450.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    tag_size = 0.04
    depth = 0.35
    offset = np.array([0.02, -0.01, depth])
    img = _render_tag(K, tag_size, offset)

    # camera sits at base origin, identity orientation; tag center == socket
    tr = ApriltagTracker(frame_fn=lambda: img, tag_size_m=tag_size,
                         fx=fx, fy=fy, cx=cx, cy=cy,
                         cam_pos=(0, 0, 0), cam_quat=(1, 0, 0, 0),
                         tag_to_socket=(0, 0, 0))
    s = tr._read()
    assert s is not None
    assert np.allclose(s["socket_pos"], offset, atol=5e-3)
    # fronto-parallel: base-frame tag rotation ~ identity quaternion
    assert abs(abs(float(s["socket_quat"][0])) - 1.0) < 0.05
    assert tr.drop is False


def test_apriltag_tracker_drop_debounce():
    blank = np.full((64, 64), 255, np.uint8)
    tr = ApriltagTracker(frame_fn=lambda: blank, drop_count=3)
    for _ in range(2):
        assert tr._read() is None
    assert tr.drop is False  # below the debounce threshold
    tr._read()
    assert tr.drop is True


def test_eki_arm_wire_format_roundtrip():
    q = np.linspace(-1.0, 1.0, 7).astype(np.float32)
    msg = EkiIiwaArm._encode_command(q)
    assert msg.startswith(b"<RobotCommand>") and msg.endswith(b"/></RobotCommand>\n")
    state = ('<RobotState><Joints ' +
             " ".join(f'A{i+1}="{q[i]:.6f}"' for i in range(7)) +
             '/><Wrench Fx="1" Fy="2" Fz="3" Tx="4" Ty="5" Tz="6"/></RobotState>')
    qq, wrench = EkiIiwaArm._parse_state(state)
    assert np.allclose(qq, q, atol=1e-5)
    assert np.allclose(wrench, [1, 2, 3, 4, 5, 6])


def test_eki_arm_loopback_transaction():
    """A fake EKI controller echoes commanded joints back as measured state;
    the driver must update its joint estimate from the reply."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def controller():
        conn, _ = srv.accept()
        buf = b""
        while b"\n" not in buf:
            buf += conn.recv(4096)
        import xml.etree.ElementTree as ET

        root = ET.fromstring(buf.split(b"\n")[0].decode())
        attrs = " ".join(f'A{i+1}="{root.find("Joints").attrib[f"A{i+1}"]}"'
                         for i in range(7))
        conn.sendall(f'<RobotState><Joints {attrs}/>'
                     f'<Wrench Fx="0" Fy="0" Fz="9.8" Tx="0" Ty="0" Tz="0"/>'
                     f'</RobotState>\n'.encode())
        conn.close()

    t = threading.Thread(target=controller, daemon=True)
    t.start()
    arm = EkiIiwaArm("127.0.0.1", port=port)
    target = arm._init_q + 0.05
    arm._transact(np.asarray(target, np.float32))
    assert np.allclose(arm._q, target, atol=1e-5)
    assert np.isclose(arm._wrench[2], 9.8)
    t.join(timeout=2)
    arm.stop()
    srv.close()


def test_openhand_servo_vec_roundtrip():
    """vec -> servo -> vec is the identity on the servo-controllable subspace
    (proximal joints + spread); distal follows the 0.4 tendon ratio. Pins the
    mapping's self-consistency (drivers.py _servo_to_vec/_vec_to_servo)."""
    from isaacgyminsertion_tpu.deploy.devices import OpenhandConfig
    from isaacgyminsertion_tpu.deploy.drivers import SerialOpenhand

    o = OpenhandConfig()
    # exercise the pure mapping without a serial bus
    hand = SerialOpenhand.__new__(SerialOpenhand)
    hand.oh = o
    hand.motor_ids = (1, 2, 3, 4)
    vec = np.array([o.base_angle,
                    o.proximal_open + 0.3, o.distal_open + 0.12,
                    o.proximal_open + 0.5, o.distal_open + 0.20,
                    o.proximal_open + 0.1, o.distal_open + 0.04,
                    0.25], np.float32)
    ticks = hand._vec_to_servo(vec)
    back = hand._servo_to_vec(ticks)
    # proximal + spread joints are exactly recovered
    assert np.allclose(back[[1, 3, 5, 7]], vec[[1, 3, 5, 7]], atol=1e-5)
    # distal joints are reconstructed through the tendon ratio
    for f in range(3):
        assert np.isclose(back[2 + 2 * f] - o.distal_open,
                          0.4 * (vec[1 + 2 * f] - o.proximal_open), atol=1e-5)


def test_seg_tracker_follows_moving_object():
    """SegTracker (tracking_SAM analog): annotate once, propagate across a
    moving synthetic object; the mask must follow with decent IoU and the
    shrink util must reduce area by the requested fraction."""
    pytest.importorskip("cv2")
    import numpy as np

    from isaacgyminsertion_tpu.deploy.drivers import SegTracker

    rng = np.random.default_rng(0)

    def frame_with_square(x, y, s=40):
        f = np.full((180, 320, 3), 30, np.uint8)
        f += rng.integers(0, 8, f.shape, dtype=np.uint8)  # sensor noise
        f[y:y + s, x:x + s] = (200, 60, 60)  # red-ish plug
        return f

    t = SegTracker()
    assert not t.is_tracking()
    f0 = frame_with_square(60, 60)
    m0 = np.zeros((180, 320), np.uint8)
    m0[60:100, 60:100] = 1
    out0 = t.annotate_init_frame(f0, mask=m0)
    assert t.is_tracking()
    assert set(np.unique(out0)) <= {0, 2}

    x = y = 60
    for i in range(10):
        x += 6
        y += 3
        mask = t.propagate_one_frame(frame_with_square(x, y))
    gt = np.zeros((180, 320), bool)
    gt[y:y + 40, x:x + 40] = True
    pred = mask > 0
    iou = (gt & pred).sum() / max((gt | pred).sum(), 1)
    assert iou > 0.5, f"tracker lost the object: IoU {iou:.2f}"
    assert mask.max() == 2  # plug_id contract

    shrunk = t.shrink_mask(mask, 20.0)
    assert 0.5 * pred.sum() < (shrunk > 0).sum() <= 0.85 * pred.sum()
