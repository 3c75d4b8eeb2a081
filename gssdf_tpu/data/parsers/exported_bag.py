"""Parser for rosbag-exported datasets (FAST-LIVO2 / R3live file form).

Reference analog: ``dataparser::Rosbag::load_data``
(data_parsers/rosbag_parser.hpp:229-287): the reference's bag parsers first
export ``images/<n>.png`` (undistorted), ``depths/<n>.ply`` (body-frame
clouds), ``color_poses.txt`` / ``depth_poses.txt`` (type-0 4x4, already
composed with the T_B_C / T_B_L extrinsics), then reload from those files.
This parser reads that exported layout directly — no ROS dependency.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ...sensors.cameras import Camera
from ..base import BaseParser, DepthType, list_files
from ..poses import load_poses


class ExportedBagParser(BaseParser):
    def __init__(
        self,
        dataset_path,
        camera: Camera,
        ds_pt_num=100000,
        res_scale=1.0,
        llff=True,
        color_dir: str = "images",
        depth_dir: str = "depths",
    ):
        super().__init__(dataset_path, ds_pt_num, res_scale, llff)
        self.camera = camera.scaled(res_scale)
        self.depth_type = DepthType.PLY
        self.color_dir = color_dir
        self.depth_dir = depth_dir
        self.load_data()

    def load_data(self):
        self.color_poses = load_poses(
            self.dataset_path / "color_poses.txt", pose_type=0
        ).poses
        self.depth_poses = load_poses(
            self.dataset_path / "depth_poses.txt", pose_type=0
        ).poses
        self.color_files = list_files(
            self.dataset_path / self.color_dir, "", ".png"
        )
        self.depth_files = list_files(
            self.dataset_path / self.depth_dir, "", ".ply"
        )
        assert len(self.color_files) == len(self.color_poses)
        assert len(self.depth_files) == len(self.depth_poses)
        self.apply_split()
