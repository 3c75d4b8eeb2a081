"""Oxford-Spires dataset parser.

Reference analog: ``dataparser::Spires``
(data_parsers/oxford_spires_parser.hpp:8-149): raw layout is
``gt-tum.txt`` (TUM poses of the body) + ``images/cam0/*.jpg`` +
``lidar-clouds/*.pcd``; on first load it timestamp-aligns, composes
T_W_C = T_W_B * T_B_L * T_C_L^-1 and T_W_L = T_W_B * T_B_L, undistorts
images and exports the generic layout (``undistorted_images/``, ``depths/``,
``color_poses.txt`` / ``depth_poses.txt``) which subsequent loads reuse
(the ExportedBagParser file form, with llff split).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from ...sensors.cameras import Camera
from ..base import BaseParser, DepthType, list_files
from ..poses import align_pose_sensor, load_poses


class SpiresParser(BaseParser):
    def __init__(
        self,
        dataset_path,
        camera: Camera,
        T_C_L: np.ndarray,
        T_B_L: np.ndarray,
        ds_pt_num=100000,
        res_scale=1.0,
        llff=True,
        max_time_diff_camera_and_pose: float = 0.0,
        max_time_diff_lidar_and_pose: float = 0.0,
    ):
        super().__init__(dataset_path, ds_pt_num, res_scale, llff)
        self.camera = camera.scaled(res_scale)
        self.T_C_L = np.asarray(T_C_L, np.float64).reshape(4, 4)
        self.T_B_L = np.asarray(T_B_L, np.float64).reshape(4, 4)
        self.depth_type = DepthType.PCD
        self.max_dt_cam = max_time_diff_camera_and_pose
        self.max_dt_lidar = max_time_diff_lidar_and_pose
        self.load_data()

    def _exported(self) -> bool:
        d = self.dataset_path
        return (
            (d / "color_poses.txt").exists()
            and (d / "depth_poses.txt").exists()
            and (d / "undistorted_images").is_dir()
            and (d / "depths").is_dir()
        )

    def load_data(self):
        if not self._exported():
            self._export_generic_layout()

        d = self.dataset_path
        self.color_poses = load_poses(d / "color_poses.txt", pose_type=0).poses
        self.depth_poses = load_poses(d / "depth_poses.txt", pose_type=0).poses
        self.color_files = list_files(d / "undistorted_images", "", ".jpg")
        self.depth_files = list_files(d / "depths", "", ".pcd")
        assert len(self.color_files) == len(self.color_poses)
        assert len(self.depth_files) == len(self.depth_poses)
        # images already undistorted at export
        self._undistort = (self.camera, None, None)
        self.apply_split()

    def _export_generic_layout(self):
        """One-time raw -> generic export
        (oxford_spires_parser.hpp:45-112)."""
        import cv2

        d = self.dataset_path
        pf = load_poses(d / "gt-tum.txt", pose_type=3)
        T_W_B = pf.poses.astype(np.float64)
        T_W_L = T_W_B @ self.T_B_L
        T_W_C = T_W_L @ np.linalg.inv(self.T_C_L)

        color_files = list_files(d / "images" / "cam0", "", ".jpg")
        depth_files = list_files(d / "lidar-clouds", "", ".pcd")
        color_files, color_poses = align_pose_sensor(
            color_files, T_W_C.astype(np.float32), pf.timestamps,
            self.max_dt_cam or 0.1,
        )
        depth_files, depth_poses = align_pose_sensor(
            depth_files, T_W_L.astype(np.float32), pf.timestamps,
            self.max_dt_lidar or 0.1,
        )

        out_img = d / "undistorted_images"
        out_depth = d / "depths"
        out_img.mkdir(exist_ok=True)
        out_depth.mkdir(exist_ok=True)

        cam_und, mx, my = self.camera.undistort_maps()
        with open(d / "color_poses.txt", "w") as f:
            for fp, pose in zip(color_files, color_poses):
                img = cv2.imread(str(fp), cv2.IMREAD_ANYCOLOR)
                if mx is not None:
                    img = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
                cv2.imwrite(str(out_img / Path(fp).name), img)
                for row in np.asarray(pose).reshape(4, 4):
                    f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
        self.camera = cam_und.scaled(1.0)
        with open(d / "depth_poses.txt", "w") as f:
            for fp, pose in zip(depth_files, depth_poses):
                shutil.copyfile(fp, out_depth / Path(fp).name)
                for row in np.asarray(pose).reshape(4, 4):
                    f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
