"""Pose text-format loaders (7 formats) — numpy, host-side.

Reference analog: DataParser::load_poses (base_parser.cpp:509-780):
  type 0: 4x4 matrix over 4 lines, 4 cols per line
  type 1: 4x4 matrix, 16 cols on one line
  type 2: KITTI 3x4 matrix, 12 cols on one line
  type 3: TUM: t x y z qx qy qz qw
  type 4: COLMAP images.txt: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME
          (every second line = keypoints, skipped; pose is world->cam)
  type 5: timestamped quat: t qw qx qy qz x y z
  type 6: csv TUM: idx,t,qw,qx,qy,qz,x,y,z
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


def quat_to_rot_np(q: np.ndarray, xyzw: bool = False) -> np.ndarray:
    """[..., 4] quaternion -> [..., 3, 3]. Order wxyz unless xyzw=True."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
    if xyzw:
        x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    else:
        w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), dtype=np.float64)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def rot_to_quat_np(R: np.ndarray) -> np.ndarray:
    """[3,3] -> wxyz quaternion (used by COLMAP export)."""
    R = np.asarray(R, dtype=np.float64)
    t = np.trace(R)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        w = 0.25 / s
        x = (R[2, 1] - R[1, 2]) * s
        y = (R[0, 2] - R[2, 0]) * s
        z = (R[1, 0] - R[0, 1]) * s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = 2.0 * np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12))
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[i + 1] = 0.25 * s
        q[j + 1] = (R[j, i] + R[i, j]) / s
        q[k + 1] = (R[k, i] + R[i, k]) / s
        w, x, y, z = q
    q = np.array([w, x, y, z])
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def _pose_from_qt(quat_wxyz, t) -> np.ndarray:
    pose = np.eye(4)
    pose[:3, :3] = quat_to_rot_np(np.asarray(quat_wxyz))
    pose[:3, 3] = t
    return pose


@dataclass
class PoseFile:
    poses: np.ndarray                      # [N, 4, 4] float32
    timestamps: np.ndarray                 # [N] float64 (may be empty)
    image_names: List[str] = field(default_factory=list)
    camera_ids: List[int] = field(default_factory=list)


def load_poses(
    path: os.PathLike,
    pose_type: int,
    with_head: bool = False,
    skip_line: bool = False,
    filter_name: str = "",
    inverse: bool = False,
) -> PoseFile:
    if not os.path.exists(path):
        raise FileNotFoundError(f"Pose file does not exist: {path}")
    with open(path) as f:
        lines = f.read().splitlines()

    poses: List[np.ndarray] = []
    stamps: List[float] = []
    names: List[str] = []
    cam_ids: List[int] = []

    if pose_type == 0:
        if with_head:
            lines = lines[1:]
        vals = [[float(v) for v in ln.split()] for ln in lines if ln.strip()]
        rows = np.asarray(vals, dtype=np.float64)
        assert rows.shape[0] % 4 == 0, "type-0 pose file must be 4 lines/pose"
        poses = list(rows.reshape(-1, 4, 4))
    elif pose_type in (1, 2):
        for ln in lines:
            v = [float(x) for x in ln.split()]
            if not v:
                continue
            pose = np.eye(4)
            arr = np.asarray(v).reshape(-1, 4)
            pose[: arr.shape[0], :] = arr
            poses.append(pose)
    elif pose_type == 3:
        for ln in lines:
            if not ln.strip() or ln.startswith("#"):
                continue
            v = [float(x) for x in ln.split()]
            t, tx, ty, tz, qx, qy, qz, qw = v[:8]
            stamps.append(t)
            pose = np.eye(4)
            pose[:3, :3] = quat_to_rot_np([qx, qy, qz, qw], xyzw=True)
            pose[:3, 3] = (tx, ty, tz)
            poses.append(pose)
    elif pose_type == 4:
        skip_next = False
        for ln in lines:
            if skip_next:
                skip_next = False
                continue
            if not ln.strip() or ln.startswith("#"):
                continue
            if filter_name and filter_name not in ln:
                continue
            parts = ln.split()
            _, qw, qx, qy, qz, tx, ty, tz = (
                parts[0],
                *[float(x) for x in parts[1:8]],
            )
            cam_id = int(parts[8])
            name = parts[9]
            pose = _pose_from_qt([qw, qx, qy, qz], [tx, ty, tz])
            if inverse:
                pose = np.linalg.inv(pose)
            poses.append(pose)
            names.append(os.path.basename(name) if filter_name else name)
            cam_ids.append(cam_id)
            skip_next = True  # COLMAP images.txt: next line = keypoints
    elif pose_type == 5:
        for ln in lines:
            if not ln.strip():
                continue
            if filter_name and filter_name not in ln:
                continue
            v = [float(x) for x in ln.split()]
            t, qw, qx, qy, qz, tx, ty, tz = v[:8]
            stamps.append(t)
            pose = _pose_from_qt([qw, qx, qy, qz], [tx, ty, tz])
            if inverse:
                pose = np.linalg.inv(pose)
            poses.append(pose)
    elif pose_type == 6:
        for ln in lines:
            if not ln.strip():
                continue
            v = [float(x) for x in ln.split(",")]
            _, _, qw, qx, qy, qz, tx, ty, tz = v[:9]
            pose = _pose_from_qt([qw, qx, qy, qz], [tx, ty, tz])
            if inverse:
                pose = np.linalg.inv(pose)
            poses.append(pose)
    else:
        raise ValueError(f"unknown pose_type {pose_type}")

    return PoseFile(
        poses=np.asarray(poses, dtype=np.float32),
        timestamps=np.asarray(stamps, dtype=np.float64),
        image_names=names,
        camera_ids=cam_ids,
    )


def align_pose_sensor(
    files: List[os.PathLike],
    poses: np.ndarray,
    timestamps: np.ndarray,
    max_time_diff: float,
):
    """Match sensor files (stem = timestamp) to pose timestamps within
    ``max_time_diff`` (base_parser.cpp:782-806). Returns (files, poses)."""
    if timestamps.size == 0:
        return files, poses
    out_files, out_poses = [], []
    for fp in files:
        t = float(os.path.splitext(os.path.basename(fp))[0])
        diffs = np.abs(timestamps - t)
        idx = int(np.argmin(diffs))
        if diffs[idx] < max_time_diff:
            out_files.append(fp)
            out_poses.append(poses[idx])
    return out_files, np.asarray(out_poses, dtype=np.float32)
