"""NeuralRGBD dataset parser.

Reference analog: ``dataparser::NeuralRGBD``
(data_parsers/neuralrgbd_parser.hpp:7-89): poses.txt (type-0, 4-line 4x4),
images/img*.png, depth{,_filtered,_with_noise}/depth*.png, focal.txt,
OpenGL->OpenCV world+camera system change (reference passes system_type=2), gt_mesh_culled.ply,
640x480, llff split.
"""

from __future__ import annotations

import numpy as np

from ...coordinates import SystemType, change_camera_system, change_world_system
from ...sensors.cameras import Camera
from ..base import BaseParser, DepthType, list_files
from ..poses import load_poses


class NeuralRGBDParser(BaseParser):
    def __init__(self, dataset_path, ds_pt_num=100000, res_scale=1.0,
                 llff=True, depth_variant: int = 0):
        super().__init__(dataset_path, ds_pt_num, res_scale, llff)
        focal = float(
            open(self.dataset_path / "focal.txt").readline().strip()
        )
        self.camera = Camera(
            fx=focal, fy=focal, cx=0.5 * (640 - 1), cy=0.5 * (480 - 1),
            width=640, height=480,
        ).scaled(res_scale)
        self.depth_scale_inv = 1.0 / 1000.0
        self.depth_type = DepthType.Image
        self.depth_dir = {
            0: "depth", 1: "depth_filtered", 2: "depth_with_noise"
        }[depth_variant]
        self.gt_mesh_path = self.dataset_path / "gt_mesh_culled.ply"
        self.load_data()

    def load_data(self):
        pf = load_poses(self.dataset_path / "poses.txt", pose_type=0)
        poses = change_world_system(pf.poses, SystemType.OpenGL)
        poses = change_camera_system(poses, SystemType.OpenGL)
        self.color_poses = poses
        self.depth_poses = poses
        self.color_files = list_files(self.dataset_path / "images", "img", ".png")
        self.depth_files = list_files(
            self.dataset_path / self.depth_dir, "depth", ".png"
        )
        assert len(self.color_files) == len(self.color_poses)
        assert len(self.depth_files) == len(self.color_files)
        self.apply_split()
