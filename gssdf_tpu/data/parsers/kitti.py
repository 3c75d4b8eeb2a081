"""KITTI odometry parser.

Reference analog: ``dataparser::Kitti`` (data_parsers/kitti_parser.hpp:8-122):
standard KITTI odometry layout relative to the velodyne sequence dir;
calib.txt P2/Tr -> intrinsics, T_C0_C2 baseline shift and T_C0_L; poses are
T_C0_C0 (type-2, 3x4 rows) converted from the KITTI world convention;
velodyne *.bin point clouds as depth.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ...coordinates import SystemType, change_world_system
from ...sensors.cameras import Camera
from ..base import BaseParser, DepthType, list_files
from ..poses import load_poses


class KittiParser(BaseParser):
    def __init__(self, dataset_lidar_path, ds_pt_num=100000, res_scale=1.0,
                 llff=True):
        super().__init__(dataset_lidar_path, ds_pt_num, res_scale, llff)
        self.depth_type = DepthType.BIN
        seq = self.dataset_path.name
        base = (self.dataset_path / "../../../..").resolve()
        self.calib_path = (
            base / "data_odometry_calib/dataset/sequences" / seq / "calib.txt"
        )
        self.pose_path = (
            base / "data_odometry_poses/dataset/poses" / f"{seq}.txt"
        )
        self.color_dir = (
            base / "data_odometry_color/dataset/sequences" / seq / "image_2"
        )
        self.velo_dir = (
            base / "data_odometry_velodyne/dataset/sequences" / seq / "velodyne"
        )
        self._load_calib()
        self.load_data()

    def _load_calib(self):
        fx = fy = cx = cy = 0.0
        self.T_C0_L = np.eye(4, dtype=np.float64)
        self.T_C0_C2 = np.eye(4, dtype=np.float64)
        for line in open(self.calib_path):
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "P2:":
                v = [float(x) for x in tok[1:]]
                fx, cx, fy, cy = v[0], v[2], v[5], v[6]
                self.T_C0_C2[0, 3] = -v[3] / fx
                self.T_C0_C2[1, 3] = -v[7] / fy
                self.T_C0_C2[2, 3] = -v[11]
            elif tok[0] == "Tr:":
                v = [float(x) for x in tok[1:]]
                self.T_C0_L[:3, :] = np.asarray(v).reshape(3, 4)
        self.camera = Camera(
            fx=fx, fy=fy, cx=cx, cy=cy, width=1241, height=376
        ).scaled(self.res_scale)
        self.depth_scale_inv = 1.0

    def load_data(self):
        pf = load_poses(self.pose_path, pose_type=2)
        T_W_C0 = change_world_system(pf.poses, SystemType.Kitti)
        self.color_poses = (T_W_C0 @ self.T_C0_C2).astype(np.float32)
        self.depth_poses = (T_W_C0 @ self.T_C0_L).astype(np.float32)
        self.color_files = list_files(self.color_dir, "", ".png")
        self.depth_files = list_files(self.velo_dir, "", ".bin")
        assert len(self.color_files) == len(self.color_poses)
        assert len(self.depth_files) == len(self.depth_poses)
        self.apply_split()
