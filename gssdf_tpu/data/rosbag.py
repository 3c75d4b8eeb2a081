"""Pure-Python ROS1 bag (v2.0) reader — no ROS installation.

Reference analog: the reference links rosbag/cv_bridge/PCL to ingest
FAST-LIVO2 / R3live bags (data_parsers/rosbag_parser.hpp:14-336;
scripts/rosbag_convert/rosbag_to_colmap.py). This module parses the bag
container (records, chunks with none/bz2 compression, connections) and
deserializes the four message types the pipeline needs:

  nav_msgs/Odometry, sensor_msgs/Image, sensor_msgs/CompressedImage,
  sensor_msgs/PointCloud2.

Format: http://wiki.ros.org/Bags/Format/2.0 — records are
(u32 header_len, header fields, u32 data_len, data); header fields are
(u32 len, b"name=" + value).
"""

from __future__ import annotations

import bz2
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_OP_MSG = 0x02
_OP_BAG_HEADER = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNK_INFO = 0x06
_OP_CONNECTION = 0x07


def _read_header(buf: bytes) -> Dict[str, bytes]:
    fields: Dict[str, bytes] = {}
    i = 0
    while i < len(buf):
        (flen,) = struct.unpack_from("<I", buf, i)
        i += 4
        f = buf[i : i + flen]
        i += flen
        k, _, v = f.partition(b"=")
        fields[k.decode()] = v
    return fields


def _records(buf: bytes, offset: int = 0) -> Iterator[Tuple[Dict, bytes]]:
    i = offset
    n = len(buf)
    while i + 4 <= n:
        (hlen,) = struct.unpack_from("<I", buf, i)
        i += 4
        header = _read_header(buf[i : i + hlen])
        i += hlen
        (dlen,) = struct.unpack_from("<I", buf, i)
        i += 4
        data = buf[i : i + dlen]
        i += dlen
        yield header, data


@dataclass
class Connection:
    cid: int
    topic: str
    msg_type: str


@dataclass
class BagMessage:
    topic: str
    msg_type: str
    time: float          # record receive time (secs)
    raw: bytes           # serialized message body


class BagReader:
    def __init__(self, path):
        self.path = Path(path)
        data = self.path.read_bytes()
        magic = b"#ROSBAG V2.0\n"
        if not data.startswith(magic):
            raise ValueError(f"{path}: not a ROSBAG V2.0 file")
        self._data = data
        self._start = len(magic)
        self.connections: Dict[int, Connection] = {}

    def messages(
        self, topics: Optional[List[str]] = None
    ) -> Iterator[BagMessage]:
        for header, data in _records(self._data, self._start):
            op = header.get("op", b"\x00")[0]
            if op == _OP_CONNECTION:
                self._add_connection(header, data)
            elif op == _OP_CHUNK:
                comp = header.get("compression", b"none").decode()
                if comp == "none":
                    chunk = data
                elif comp == "bz2":
                    chunk = bz2.decompress(data)
                elif comp == "lz4":
                    try:
                        import lz4.frame  # pragma: no cover

                        chunk = lz4.frame.decompress(data)
                    except ImportError as e:  # pragma: no cover
                        raise RuntimeError(
                            "bag uses lz4 compression; lz4 not installed"
                        ) from e
                else:
                    raise ValueError(f"unknown chunk compression {comp}")
                for h2, d2 in _records(chunk):
                    op2 = h2.get("op", b"\x00")[0]
                    if op2 == _OP_CONNECTION:
                        self._add_connection(h2, d2)
                    elif op2 == _OP_MSG:
                        m = self._make_msg(h2, d2, topics)
                        if m is not None:
                            yield m
            elif op == _OP_MSG:
                m = self._make_msg(header, data, topics)
                if m is not None:
                    yield m

    def _add_connection(self, header: Dict, data: bytes):
        cid = struct.unpack("<I", header["conn"])[0]
        conn_fields = _read_header(data)
        topic = header.get("topic", b"").decode()
        self.connections[cid] = Connection(
            cid=cid,
            topic=conn_fields.get("topic", topic.encode()).decode()
            if isinstance(conn_fields.get("topic", topic), bytes)
            else topic,
            msg_type=conn_fields.get("type", b"").decode(),
        )

    def _make_msg(self, header, data, topics) -> Optional[BagMessage]:
        cid = struct.unpack("<I", header["conn"])[0]
        conn = self.connections.get(cid)
        if conn is None:
            return None
        if topics and conn.topic not in topics:
            return None
        secs, nsecs = struct.unpack("<II", header["time"])
        return BagMessage(
            topic=conn.topic,
            msg_type=conn.msg_type,
            time=secs + nsecs * 1e-9,
            raw=data,
        )


# ---------------------------------------------------------------------------
# message deserialization
# ---------------------------------------------------------------------------


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def u8(self):
        v = self.buf[self.i]
        self.i += 1
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.buf, self.i)
        self.i += 4
        return v

    def f64(self):
        (v,) = struct.unpack_from("<d", self.buf, self.i)
        self.i += 8
        return v

    def string(self) -> str:
        n = self.u32()
        s = self.buf[self.i : self.i + n]
        self.i += n
        return s.decode(errors="replace")

    def bytes_(self, n) -> bytes:
        b = self.buf[self.i : self.i + n]
        self.i += n
        return b

    def skip(self, n):
        self.i += n


def _read_std_header(c: _Cursor) -> float:
    c.u32()  # seq
    secs = c.u32()
    nsecs = c.u32()
    c.string()  # frame_id
    return secs + nsecs * 1e-9


def parse_odometry(raw: bytes):
    """nav_msgs/Odometry -> (stamp, position [3], quat wxyz [4])."""
    c = _Cursor(raw)
    stamp = _read_std_header(c)
    c.string()  # child_frame_id
    pos = np.array([c.f64(), c.f64(), c.f64()])
    qx, qy, qz, qw = c.f64(), c.f64(), c.f64(), c.f64()
    return stamp, pos, np.array([qw, qx, qy, qz])


def parse_image(raw: bytes):
    """sensor_msgs/Image -> (stamp, [H, W, C] uint8 BGR-ish as stored)."""
    c = _Cursor(raw)
    stamp = _read_std_header(c)
    h = c.u32()
    w = c.u32()
    encoding = c.string()
    c.u8()   # is_bigendian
    step = c.u32()
    n = c.u32()
    data = np.frombuffer(c.bytes_(n), np.uint8)
    ch = step // w if w else 1
    img = data.reshape(h, step)[:, : w * ch].reshape(h, w, ch)
    return stamp, img, encoding


def parse_compressed_image(raw: bytes):
    """sensor_msgs/CompressedImage -> (stamp, decoded [H, W, 3] BGR)."""
    import cv2

    c = _Cursor(raw)
    stamp = _read_std_header(c)
    c.string()  # format
    n = c.u32()
    buf = np.frombuffer(c.bytes_(n), np.uint8)
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    return stamp, img


_PF_DTYPES = {1: "i1", 2: "u1", 3: "i2", 4: "u2", 5: "i4", 6: "u4",
              7: "f4", 8: "f8"}


def parse_pointcloud2(raw: bytes):
    """sensor_msgs/PointCloud2 -> (stamp, xyz [N, 3] float32)."""
    c = _Cursor(raw)
    stamp = _read_std_header(c)
    h = c.u32()
    w = c.u32()
    nf = c.u32()
    fields = []
    for _ in range(nf):
        name = c.string()
        offset = c.u32()
        datatype = c.u8()
        count = c.u32()
        fields.append((name, offset, datatype, count))
    c.u8()  # is_bigendian
    point_step = c.u32()
    c.u32()  # row_step
    n = c.u32()
    data = c.bytes_(n)
    num = (h * w) if h * w else n // max(point_step, 1)

    cols = {}
    for name, offset, datatype, count in fields:
        if name not in ("x", "y", "z"):
            continue
        dt = np.dtype("<" + _PF_DTYPES[datatype])
        arr = np.frombuffer(
            data, dtype=dt, count=num,
            offset=offset,
        ) if point_step == dt.itemsize else np.ndarray(
            (num,), dt, data, offset, (point_step,)
        )
        cols[name] = arr.astype(np.float32)
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1)
    return stamp, xyz[np.isfinite(xyz).all(-1)]
