"""Camera models, ray generation, depth->points/normals.

Reference analog: include/utils/sensor_utils/cameras.hpp. Pinhole +
radial/fisheye distortion (undistortion handled at image load via cv2, as the
reference does with initUndistortRectifyMap, cameras.hpp:63-121).

Ray generation and depth->normal are jax.numpy and differentiable: the normal
consistency loss backprops through ``depth_to_normal`` (neural_mapping.cpp:
243-266).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Camera:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    model: int = 0  # 0: pinhole; 1: equidistant/fisheye
    dist: Tuple[float, float, float, float, float] = (0.0, 0.0, 0.0, 0.0, 0.0)

    def scaled(self, s: float) -> "Camera":
        if s == 1.0:
            return self
        return dataclasses.replace(
            self,
            fx=self.fx * s,
            fy=self.fy * s,
            cx=self.cx * s,
            cy=self.cy * s,
            width=int(round(self.width * s)),
            height=int(round(self.height * s)),
        )

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]],
            dtype=np.float32,
        )

    def undistort_maps(self):
        """Precompute cv2 undistortion remaps and the new intrinsics.

        Returns (new_camera, map_x, map_y) or (self, None, None) when there is
        no distortion. Mirrors cameras.hpp:63-121 incl. fisheye.
        """
        if not any(self.dist):
            return self, None, None
        import cv2

        K = self.K.astype(np.float64)
        size = (self.width, self.height)
        if self.model == 0:
            D = np.array(self.dist, dtype=np.float64)
            new_K, _ = cv2.getOptimalNewCameraMatrix(K, D, size, 0, size, True)
            mx, my = cv2.initUndistortRectifyMap(
                K, D, np.eye(3), new_K, size, cv2.CV_16SC2
            )
        else:
            D = np.array(self.dist[:4], dtype=np.float64)
            new_K = K.copy()
            mx, my = cv2.fisheye.initUndistortRectifyMap(
                K, D, np.eye(3), new_K, size, cv2.CV_16SC2
            )
        cam = dataclasses.replace(
            self,
            fx=float(new_K[0, 0]),
            fy=float(new_K[1, 1]),
            cx=float(new_K[0, 2]),
            cy=float(new_K[1, 2]),
            dist=(0.0, 0.0, 0.0, 0.0, 0.0),
        )
        return cam, mx, my


def image_coords(height: int, width: int, pixel_offset: float = 0.5):
    """[H, W, 2] of (y, x) pixel-center coordinates (cameras.hpp:7-13)."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy, gx], -1) + pixel_offset


def camera_zdirs(cam: Camera, scale: float = 1.0):
    """[H, W, 3] unit-z camera-frame directions (cameras.hpp:15-28)."""
    h, w = int(cam.height * scale), int(cam.width * scale)
    vu = image_coords(h, w)
    x = (vu[..., 1] - scale * cam.cx) / (scale * cam.fx)
    y = (vu[..., 0] - scale * cam.cy) / (scale * cam.fy)
    return jnp.stack([x, y, jnp.ones_like(x)], -1)


def camera_rays(cam: Camera, scale: float = 1.0):
    """Returns (ndir [H*W,3] unit, zdir_norm [H*W,1]) in the camera frame."""
    zdir = camera_zdirs(cam, scale).reshape(-1, 3)
    n = jnp.linalg.norm(zdir, axis=-1, keepdims=True)
    return zdir / n, n


def rays_from_pose(cam: Camera, pose_c2w, scale: float = 1.0):
    """World-frame rays for every pixel. pose_c2w: [3or4, 4].

    Returns (ray_o [H*W,3], ray_d unit [H*W,3], zdir_norm [H*W,1]);
    cameras.hpp:150-166.
    """
    ndir, n = camera_rays(cam, scale)
    R = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    ray_d = jnp.matmul(ndir, R.T, precision=jax.lax.Precision.HIGHEST)
    ray_o = jnp.broadcast_to(t, ray_d.shape)
    return ray_o, ray_d, n


def depth_to_points(cam: Camera, pose_c2w, depth):
    """Backproject a [H, W, 1] z-depth map to world points [H, W, 3]
    (cameras.hpp:176-199)."""
    zdir = camera_zdirs(cam)
    R = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    dirs_w = jnp.matmul(zdir, R.T, precision=jax.lax.Precision.HIGHEST)
    return dirs_w * depth + t


def points_to_normals(points):
    """Finite-difference cross-product normals of a [H, W, 3] point map,
    zero on the 1-pixel border (cameras.hpp:201-220)."""
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # rsqrt(|n|^2 + eps) keeps the GRADIENT finite at zero-length normals
    # (empty-sky pixels): norm()'s derivative at 0 is NaN and a downstream
    # mask multiplies NaN * 0 = NaN into the backward pass.
    n = n * jax.lax.rsqrt(jnp.sum(n * n, -1, keepdims=True) + 1e-24)
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)


def depth_to_normal(cam: Camera, pose_c2w, depth):
    """[H, W, 1] depth -> [H, W, 3] world normals (cameras.hpp:222-227)."""
    return points_to_normals(depth_to_points(cam, pose_c2w, depth))
