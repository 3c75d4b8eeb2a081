"""Pure-Python rosbag reader + converter on a synthesized ROSBAG V2.0 file."""

import struct
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gssdf_tpu.data.bag_convert import FASTLIVO_TOPICS, convert_bag
from gssdf_tpu.data.parsers.exported_bag import ExportedBagParser
from gssdf_tpu.data.rosbag import BagReader, parse_odometry, parse_pointcloud2
from gssdf_tpu.sensors.cameras import Camera


def _field(name: str, value: bytes) -> bytes:
    f = name.encode() + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: dict, data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (
        struct.pack("<I", len(header)) + header
        + struct.pack("<I", len(data)) + data
    )


def _ros_time(t: float) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<II", secs, nsecs)


def _std_header(t: float, frame="map") -> bytes:
    return (
        struct.pack("<I", 0) + _ros_time(t)
        + struct.pack("<I", len(frame)) + frame.encode()
    )


def _odometry(t, pos, quat_xyzw) -> bytes:
    child = b"body"
    body = _std_header(t) + struct.pack("<I", len(child)) + child
    body += struct.pack("<ddd", *pos)
    body += struct.pack("<dddd", *quat_xyzw)
    body += struct.pack("<36d", *([0.0] * 36))   # pose covariance
    body += struct.pack("<ddd", 0, 0, 0)          # twist linear
    body += struct.pack("<ddd", 0, 0, 0)          # twist angular
    body += struct.pack("<36d", *([0.0] * 36))   # twist covariance
    return body


def _image(t, img: np.ndarray) -> bytes:
    h, w, c = img.shape
    enc = b"bgr8"
    body = _std_header(t)
    body += struct.pack("<II", h, w)
    body += struct.pack("<I", len(enc)) + enc
    body += struct.pack("<B", 0)
    body += struct.pack("<I", w * c)
    data = img.tobytes()
    body += struct.pack("<I", len(data)) + data
    return body


def _pointcloud2(t, xyz: np.ndarray) -> bytes:
    n = len(xyz)
    body = _std_header(t)
    body += struct.pack("<II", 1, n)
    fields = [(b"x", 0), (b"y", 4), (b"z", 8)]
    body += struct.pack("<I", len(fields))
    for name, off in fields:
        body += struct.pack("<I", len(name)) + name
        body += struct.pack("<I", off)
        body += struct.pack("<B", 7)  # FLOAT32
        body += struct.pack("<I", 1)
    body += struct.pack("<B", 0)          # is_bigendian
    body += struct.pack("<I", 16)         # point_step (padded)
    body += struct.pack("<I", 16 * n)     # row_step
    pts = np.zeros((n, 4), "<f4")
    pts[:, :3] = xyz
    data = pts.tobytes()
    body += struct.pack("<I", len(data)) + data
    body += struct.pack("<B", 1)          # is_dense
    return body


def _write_bag(path: Path):
    conns = {
        0: (FASTLIVO_TOPICS["pose"], "nav_msgs/Odometry"),
        1: (FASTLIVO_TOPICS["color"], "sensor_msgs/Image"),
        2: (FASTLIVO_TOPICS["depth"], "sensor_msgs/PointCloud2"),
    }
    out = b"#ROSBAG V2.0\n"
    out += _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                    "conn_count": struct.pack("<I", 3),
                    "chunk_count": struct.pack("<I", 1)}, b" " * 8)
    chunk = b""
    for cid, (topic, mtype) in conns.items():
        conn_data = (
            _field("topic", topic.encode())
            + _field("type", mtype.encode())
            + _field("md5sum", b"0" * 32)
            + _field("message_definition", b"")
        )
        chunk += _record(
            {"op": b"\x07", "conn": struct.pack("<I", cid),
             "topic": topic.encode()},
            conn_data,
        )

    img = np.zeros((8, 12, 3), np.uint8)
    img[:, :6] = (255, 0, 0)
    for i in range(3):
        t = 100.0 + i
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", 0), "time": _ros_time(t)},
            _odometry(t, [0.5 * i, 0, 0], [0, 0, 0, 1]),
        )
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", 1),
             "time": _ros_time(t)},
            _image(t + 0.004, img),
        )
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", 2),
             "time": _ros_time(t)},
            _pointcloud2(t + 0.002, np.array([[1.0, 0, 0], [0, 0, 2.0]])),
        )
    out += _record({"op": b"\x05", "compression": b"none",
                    "size": struct.pack("<I", len(chunk))}, chunk)
    path.write_bytes(out)


def test_bag_reader_messages(tmp_path):
    bag = tmp_path / "test.bag"
    _write_bag(bag)
    reader = BagReader(bag)
    msgs = list(reader.messages())
    assert len(msgs) == 9
    odo = [m for m in msgs if m.msg_type == "nav_msgs/Odometry"]
    stamp, pos, quat = parse_odometry(odo[2].raw)
    np.testing.assert_allclose(pos, [1.0, 0, 0])
    np.testing.assert_allclose(quat, [1, 0, 0, 0])
    pc = [m for m in msgs if m.msg_type.endswith("PointCloud2")][0]
    _, xyz = parse_pointcloud2(pc.raw)
    np.testing.assert_allclose(xyz, [[1.0, 0, 0], [0, 0, 2.0]])


def test_convert_bag_and_reload(tmp_path):
    bag = tmp_path / "test.bag"
    _write_bag(bag)
    cam = Camera(fx=10, fy=10, cx=6, cy=4, width=12, height=8)
    out = convert_bag(
        bag, tmp_path / "exported", cam,
        T_C_L=np.eye(4), T_B_L=np.eye(4),
    )
    assert (out / "color_poses.txt").exists()
    assert len(list((out / "images").glob("*.png"))) == 3
    assert len(list((out / "depths").glob("*.ply"))) == 3

    parser = ExportedBagParser(out, cam, llff=False)
    assert parser.num_train == 3
    np.testing.assert_allclose(parser.color_poses[2][0, 3], 1.0, atol=1e-6)
    pack = parser.build_depth_pack()
    assert len(pack) == 6
    # first cloud in sensor frame at origin pose: depths 1 and 2
    np.testing.assert_allclose(sorted(pack.depth[:2, 0]), [1.0, 2.0], atol=1e-6)


def _write_bag_frames(path: Path, images):
    """Bag with one odometry + one image message per entry of ``images``."""
    conns = {
        0: (FASTLIVO_TOPICS["pose"], "nav_msgs/Odometry"),
        1: (FASTLIVO_TOPICS["color"], "sensor_msgs/Image"),
    }
    out = b"#ROSBAG V2.0\n"
    out += _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                    "conn_count": struct.pack("<I", 2),
                    "chunk_count": struct.pack("<I", 1)}, b" " * 8)
    chunk = b""
    for cid, (topic, mtype) in conns.items():
        conn_data = (
            _field("topic", topic.encode())
            + _field("type", mtype.encode())
            + _field("md5sum", b"0" * 32)
            + _field("message_definition", b"")
        )
        chunk += _record(
            {"op": b"\x07", "conn": struct.pack("<I", cid),
             "topic": topic.encode()},
            conn_data,
        )
    for i, img in enumerate(images):
        t = 100.0 + i
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", 0),
             "time": _ros_time(t)},
            _odometry(t, [0.5 * i, 0, 0], [0, 0, 0, 1]),
        )
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", 1),
             "time": _ros_time(t)},
            _image(t + 0.004, img),
        )
    out += _record({"op": b"\x05", "compression": b"none",
                    "size": struct.pack("<I", len(chunk))}, chunk)
    path.write_bytes(out)


def test_convert_bag_frame_filtering(tmp_path):
    """PSNR-dedup skips near-duplicates; blur check replaces a blurry frame
    with the sharpest lookahead frame (rosbag_to_colmap.py:645-700)."""
    rng = np.random.RandomState(0)
    sharp_a = rng.randint(0, 255, (8, 12, 3), np.uint8)
    blurry = np.full((8, 12, 3), 128, np.uint8)          # zero Laplacian var
    sharp_b = rng.randint(0, 255, (8, 12, 3), np.uint8)
    bag = tmp_path / "filt.bag"
    _write_bag_frames(bag, [sharp_a, sharp_a.copy(), blurry, sharp_b])
    cam = Camera(fx=10, fy=10, cx=6, cy=4, width=12, height=8)
    out = convert_bag(
        bag, tmp_path / "exported", cam,
        T_C_L=np.eye(4), T_B_L=np.eye(4),
        psnr_threshold=35.0, blur_threshold=100.0,
    )
    import cv2

    files = sorted((out / "images").glob("*.png"))
    # frame1 psnr-skipped (identical), frame2 replaced by frame3
    assert len(files) == 2, files
    got0 = cv2.imread(str(files[0]))
    got1 = cv2.imread(str(files[1]))
    np.testing.assert_array_equal(got0, sharp_a)
    np.testing.assert_array_equal(got1, sharp_b)
