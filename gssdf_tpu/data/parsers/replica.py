"""Replica dataset parser.

Reference analog: ``dataparser::Replica``
(data_parsers/replica_parser.hpp:7-85): traj.txt (type-1, 16-col) poses
shared by color+depth; results/frame*.jpg + results/depth*.png; hardcoded
intrinsics 1200x680 f=600 c=(599.5, 339.5); depth scale 1/6553.5; optional
eval split under eval/; GT mesh ../cull_replica_mesh/<scene>_culled.ply.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ...sensors.cameras import Camera
from ..base import BaseParser, DepthType, list_files
from ..poses import load_poses


class ReplicaParser(BaseParser):
    def __init__(self, dataset_path, ds_pt_num=100000, res_scale=1.0,
                 llff=False):
        super().__init__(dataset_path, ds_pt_num, res_scale, llff)
        self.camera = Camera(
            fx=600.0, fy=600.0, cx=599.5, cy=339.5, width=1200, height=680
        ).scaled(res_scale)
        self.depth_scale_inv = 1.0 / 6553.5
        self.depth_type = DepthType.Image
        self.gt_mesh_path = (
            self.dataset_path.parent
            / "cull_replica_mesh"
            / f"{self.dataset_path.name}_culled.ply"
        )
        self.load_data()

    def load_data(self):
        pf = load_poses(self.dataset_path / "traj.txt", pose_type=1)
        self.color_poses = pf.poses
        self.depth_poses = pf.poses

        results = self.dataset_path / "results"
        self.color_files = list_files(results, "frame", ".jpg")
        self.depth_files = list_files(results, "depth", ".png")
        assert len(self.color_files) == len(self.color_poses), (
            len(self.color_files), len(self.color_poses),
        )
        assert len(self.depth_files) == len(self.color_files)

        eval_dir = self.dataset_path / "eval"
        if (eval_dir / "traj.txt").exists():
            epf = load_poses(eval_dir / "traj.txt", pose_type=1)
            self.eval_color_poses = epf.poses
            self.eval_color_files = list_files(
                eval_dir / "results", "frame", ".jpg"
            )
            self.eval_depth_files = list_files(
                eval_dir / "results", "depth", ".png"
            )
        self.apply_split()
