"""Camera/world coordinate-system conventions and conversions.

Reference analog: include/utils/coordinates.{h,cpp} (coordinates.h:33-66).
Conventions (camera | world):
  OpenCV  : right handed, y-down, z-lookat | right handed, z-up   (default)
  Blender : right handed, y-up, -z-lookat  | right handed, z-up
  OpenGL  : right handed, y-up, -z-lookat  | right handed, y-up
  KITTI   : right handed, y-down, z-lookat | right handed, -y-up

All functions are numpy (data preparation happens host-side); poses are
[..., 3or4, 4] cam-to-world matrices unless noted.
"""

from __future__ import annotations

import numpy as np


class SystemType:
    OpenCV = 0
    Blender = 1
    OpenGL = 2
    Kitti = 3


def _f32(x):
    return np.asarray(x, dtype=np.float32)


# opencv camera -> blender/opengl camera basis change (coordinates.cpp:42-50)
OPENCV_TO_BLENDER_CAMERA = _f32(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]]
)

# opengl world -> opencv world (coordinates.cpp:78-87)
OPENGL_TO_OPENCV_WORLD = _f32(
    [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]
)

# kitti world -> opencv world (coordinates.cpp:89-96)
KITTI_TO_OPENCV_WORLD = _f32(
    [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]]
)


def _to44(pose: np.ndarray) -> np.ndarray:
    pose = _f32(pose)
    if pose.shape[-2] == 3:
        bottom = np.broadcast_to(
            _f32([0, 0, 0, 1]), pose.shape[:-2] + (1, 4)
        )
        pose = np.concatenate([pose, bottom], axis=-2)
    return pose


def change_camera_system(pose: np.ndarray, system_type: int) -> np.ndarray:
    """Convert a c2w pose whose *camera* axes follow ``system_type`` into the
    OpenCV camera convention (right-multiply by the basis change;
    coordinates.cpp:127-204)."""
    pose = _to44(pose)
    if system_type == SystemType.OpenCV:
        return pose
    if system_type in (SystemType.Blender, SystemType.OpenGL):
        return pose @ OPENCV_TO_BLENDER_CAMERA
    raise ValueError(f"invalid camera system {system_type}")


def change_world_system(pose: np.ndarray, system_type: int) -> np.ndarray:
    """Convert a c2w pose whose *world* axes follow ``system_type`` into the
    OpenCV world convention (left-multiply)."""
    pose = _to44(pose)
    if system_type in (SystemType.OpenCV, SystemType.Blender):
        return pose
    if system_type == SystemType.OpenGL:
        return OPENGL_TO_OPENCV_WORLD @ pose
    if system_type == SystemType.Kitti:
        return KITTI_TO_OPENCV_WORLD @ pose
    raise ValueError(f"invalid world system {system_type}")


def reset_world_system(points: np.ndarray, dataset_type: int) -> np.ndarray:
    """Inverse of the world-system change, applied to exported geometry so
    meshes land back in the dataset's native frame (local_map.cpp:440).

    ``dataset_type`` follows config.DatasetType; only KITTI needs undoing.
    """
    from .config import DatasetType

    if dataset_type == DatasetType.Kitti:
        R = KITTI_TO_OPENCV_WORLD[:3, :3]
        return _f32(points) @ R  # == (R^-1 @ p^T)^T since R orthonormal
    return _f32(points)


def invert_pose(pose: np.ndarray) -> np.ndarray:
    """Invert rigid [...,4,4] or [...,3,4] transforms."""
    pose = _to44(pose)
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:4]
    Rt = np.swapaxes(R, -1, -2)
    out = np.zeros_like(pose)
    out[..., :3, :3] = Rt
    out[..., :3, 3:4] = -Rt @ t
    out[..., 3, 3] = 1.0
    return out
