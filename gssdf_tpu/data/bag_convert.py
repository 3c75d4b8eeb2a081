"""ROS bag -> exported dataset layout (no ROS installation).

Reference analog: ``Rosbag::parser_bag_to_file``
(data_parsers/rosbag_parser.hpp:60-290): collect odometry + image/compressed
+ PointCloud2 topics, nearest-timestamp match (< 10 ms), undistort + write
``images/<n>.png``, dump ``depths/<n>.ply`` (sensor-frame clouds), write
``color_poses.txt`` (T_W_C = T_W_B @ T_B_C) and ``depth_poses.txt``
(T_W_L = T_W_B @ T_B_L) in the 4x4-per-4-lines format the
ExportedBagParser reloads.

FAST-LIVO2 topics (fastlivo_parser.hpp:22-25):
  pose /aft_mapped_to_init, color /origin_img, cloud /cloud_registered_body.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..sensors.cameras import Camera
from ..utils.ply import write_ply_xyz
from .poses import quat_to_rot_np
from .rosbag import (
    BagReader,
    parse_compressed_image,
    parse_image,
    parse_odometry,
    parse_pointcloud2,
)

FASTLIVO_TOPICS = {
    "pose": "/aft_mapped_to_init",
    "color": "/origin_img",
    "depth": "/cloud_registered_body",
}
R3LIVE_TOPICS = {
    "pose": "/aft_mapped_to_init",
    "color": "/camera/image_color/compressed",
    "depth": "/cloud_registered_raw",
}


def _pose44(pos, quat_wxyz):
    T = np.eye(4)
    T[:3, :3] = quat_to_rot_np(quat_wxyz)
    T[:3, 3] = pos
    return T


def _nearest(stamp, times, max_dt=0.01) -> Optional[int]:
    if len(times) == 0:
        return None
    i = int(np.argmin(np.abs(times - stamp)))
    return i if abs(times[i] - stamp) < max_dt else None


def _psnr_u8(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR between uint8 images (rosbag_to_colmap.py:255-277)."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _blur_score(img: np.ndarray) -> float:
    """Laplacian-variance sharpness (rosbag_to_colmap.py:280-307);
    higher = sharper."""
    import cv2

    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if img.ndim == 3 else img
    return float(cv2.Laplacian(gray, cv2.CV_64F).var())


def convert_bag(
    bag_path,
    out_dir,
    camera: Camera,
    T_C_L: np.ndarray,
    T_B_L: np.ndarray,
    topics: dict = FASTLIVO_TOPICS,
    max_dt: float = 0.01,
    psnr_threshold: float = 0.0,
    blur_threshold: float = 0.0,
    blur_search_radius: int = 5,
) -> Path:
    """Returns ``out_dir`` populated with the exported layout.

    ``psnr_threshold`` > 0 skips frames too similar to the last export
    (PSNR above the threshold); ``blur_threshold`` > 0 replaces blurry
    candidates with the sharpest nearby frame within
    ``blur_search_radius`` that still passes the PSNR check
    (rosbag_to_colmap.py:645-700 frame-selection semantics)."""
    import cv2

    out = Path(out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "depths").mkdir(parents=True, exist_ok=True)

    T_B_L = np.asarray(T_B_L, np.float64).reshape(4, 4)
    T_C_L = np.asarray(T_C_L, np.float64).reshape(4, 4)
    # T_B_C = T_B_L @ T_L_C (sensors.hpp composition)
    T_B_C = T_B_L @ np.linalg.inv(T_C_L)

    reader = BagReader(bag_path)
    wanted = set(topics.values())

    pose_times, pose_mats = [], []
    color_msgs, depth_msgs = [], []
    for msg in reader.messages(list(wanted)):
        if msg.topic == topics["pose"]:
            stamp, pos, quat = parse_odometry(msg.raw)
            pose_times.append(stamp)
            pose_mats.append(_pose44(pos, quat))
        elif msg.topic == topics["color"]:
            color_msgs.append(msg)
        elif msg.topic == topics["depth"]:
            depth_msgs.append(msg)

    times = np.asarray(pose_times)
    cam_und, mx, my = camera.undistort_maps()

    dec_cache: dict = {}

    def dec(i):
        """(stamp, undistorted BGR image, pose idx, blur score) for color
        msg i; the Laplacian score is cached with the decode (it dominates
        the per-frame filter cost)."""
        if i in dec_cache:
            return dec_cache[i]
        msg = color_msgs[i]
        if msg.msg_type.endswith("CompressedImage"):
            stamp, img = parse_compressed_image(msg.raw)
        else:
            stamp, img, enc = parse_image(msg.raw)
            if enc.startswith("rgb") and img is not None:
                img = img[..., ::-1]  # store BGR like cv_bridge "bgr8"
        idx = _nearest(stamp, times, max_dt)
        if img is not None and mx is not None:
            img = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
        blur = (
            _blur_score(img)
            if blur_threshold > 0 and img is not None else 0.0
        )
        dec_cache[i] = (stamp, img, idx, blur)
        if len(dec_cache) > 2 * blur_search_radius + 4:
            dec_cache.pop(min(dec_cache))
        return dec_cache[i]

    n_color = 0
    n_skip_psnr = n_replace_blur = 0
    prev_img = None
    i = 0
    with open(out / "color_poses.txt", "w") as f:
        while i < len(color_msgs):
            stamp, img, idx, blur = dec(i)
            if idx is None or img is None:
                i += 1
                continue
            if (
                psnr_threshold > 0
                and prev_img is not None
                and _psnr_u8(img, prev_img) > psnr_threshold
            ):
                n_skip_psnr += 1
                i += 1
                continue
            if blur_threshold > 0 and blur < blur_threshold:
                # look ahead for the sharpest acceptable replacement
                best = (blur, i, img, idx)
                for j in range(i + 1, min(i + 1 + blur_search_radius,
                                          len(color_msgs))):
                    sj, imj, pj, bj = dec(j)
                    if imj is None or pj is None:
                        continue
                    if (
                        psnr_threshold > 0
                        and prev_img is not None
                        and _psnr_u8(imj, prev_img) > psnr_threshold
                    ):
                        continue
                    if bj > best[0]:
                        best = (bj, j, imj, pj)
                if best[1] != i:
                    n_replace_blur += 1
                _, i, img, idx = best
            cv2.imwrite(str(out / "images" / f"{n_color}.png"), img)
            T_W_C = pose_mats[idx] @ T_B_C
            for row in T_W_C:
                f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
            prev_img = img
            n_color += 1
            i += 1
    if n_skip_psnr or n_replace_blur:
        print(
            f"frame filter: {n_skip_psnr} skipped (psnr), "
            f"{n_replace_blur} replaced (blur)"
        )

    n_depth = 0
    with open(out / "depth_poses.txt", "w") as f:
        for msg in depth_msgs:
            stamp, xyz = parse_pointcloud2(msg.raw)
            idx = _nearest(stamp, times, max_dt)
            if idx is None:
                continue
            write_ply_xyz(out / "depths" / f"{n_depth}.ply", xyz)
            T_W_L = pose_mats[idx] @ T_B_L
            for row in T_W_L:
                f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
            n_depth += 1

    print(
        f"bag convert: {n_color} images, {n_depth} clouds, "
        f"{len(times)} poses -> {out}"
    )
    return out
