"""COLMAP-format dataset parser (fully config-driven paths/types).

Reference analog: ``dataparser::Colmap`` (data_parsers/colmap_parser.hpp:7-142)
+ ``load_cameras`` (base_parser.cpp:429-496): COLMAP images.txt poses (w2c
inversion optional), cameras.txt intrinsics (PINHOLE / OPENCV /
OPENCV_FISHEYE), lidar depth as per-frame point files, optional mask image,
llff split.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ...sensors.cameras import Camera
from ..base import BaseParser, DepthType, list_files
from ..poses import load_poses


def load_colmap_cameras(path) -> Dict[int, Camera]:
    """Parse COLMAP cameras.txt (base_parser.cpp:429-496)."""
    cams: Dict[int, Camera] = {}
    for line in open(path):
        if not line.strip() or line.startswith("#"):
            continue
        tok = line.split()
        cam_id, model = int(tok[0]), tok[1]
        w, h = int(tok[2]), int(tok[3])
        p = [float(x) for x in tok[4:]]
        if model == "PINHOLE":
            cams[cam_id] = Camera(p[0], p[1], p[2], p[3], w, h)
        elif model == "SIMPLE_PINHOLE":
            cams[cam_id] = Camera(p[0], p[0], p[1], p[2], w, h)
        elif model == "OPENCV":
            cams[cam_id] = Camera(
                p[0], p[1], p[2], p[3], w, h, model=0,
                dist=(p[4], p[5], p[6], p[7], 0.0),
            )
        elif model == "OPENCV_FISHEYE":
            cams[cam_id] = Camera(
                p[0], p[1], p[2], p[3], w, h, model=1,
                dist=(p[4], p[5], p[6], p[7], 0.0),
            )
        else:
            raise ValueError(f"unsupported COLMAP camera model {model}")
    return cams


class ColmapParser(BaseParser):
    def __init__(
        self,
        dataset_path,
        ds_pt_num=100000,
        res_scale=1.0,
        llff=True,
        *,
        camera_path: Optional[str] = "sparse/0/cameras.txt",
        color_path: str = "images",
        color_type: str = ".png",
        color_pose_path: str = "sparse/0/images.txt",
        color_pose_type: int = 4,
        color_pose_w2c: bool = True,
        depth_path: str = "depths",
        depth_type: int = DepthType.PLY,
        depth_pose_path: str = "depth_poses.txt",
        depth_pose_type: int = 0,
        camera: Optional[Camera] = None,
    ):
        super().__init__(dataset_path, ds_pt_num, res_scale, llff)
        self.depth_type = depth_type
        self._cfg = dict(
            camera_path=camera_path,
            color_path=color_path,
            color_type=color_type,
            color_pose_path=color_pose_path,
            color_pose_type=color_pose_type,
            color_pose_w2c=color_pose_w2c,
            depth_path=depth_path,
            depth_pose_path=depth_pose_path,
            depth_pose_type=depth_pose_type,
        )
        self.cameras: Dict[int, Camera] = {}
        self.camera_ids: list = []
        if camera is not None:
            self.camera = camera.scaled(res_scale)
        self.load_data()

    def _p(self, rel) -> Path:
        p = Path(rel)
        return p if p.is_absolute() else self.dataset_path / p

    def load_data(self):
        c = self._cfg
        pf = load_poses(
            self._p(c["color_pose_path"]),
            pose_type=c["color_pose_type"],
            inverse=c["color_pose_w2c"],
        )
        self.color_poses = pf.poses
        if pf.image_names:
            self.color_files = [
                self._p(c["color_path"]) / n for n in pf.image_names
            ]
            self.camera_ids = pf.camera_ids
        else:
            self.color_files = list_files(
                self._p(c["color_path"]), "", c["color_type"]
            )
            self.camera_ids = [0] * len(self.color_files)

        if c["camera_path"] and self._p(c["camera_path"]).exists():
            self.cameras = load_colmap_cameras(self._p(c["camera_path"]))
            first = self.camera_ids[0] if self.camera_ids else 1
            self.camera = self.cameras.get(
                first, next(iter(self.cameras.values()))
            ).scaled(self.res_scale)

        assert len(self.color_files) == len(self.color_poses)

        dpf = load_poses(
            self._p(c["depth_pose_path"]),
            pose_type=c["depth_pose_type"],
            inverse=c["color_pose_w2c"] and c["depth_pose_type"] == 4,
        )
        self.depth_poses = dpf.poses
        self.depth_files = list_files(
            self._p(c["depth_path"]), "", DepthType.EXT[self.depth_type]
        )
        assert len(self.depth_files) == len(self.depth_poses), (
            len(self.depth_files), len(self.depth_poses),
        )

        mask_file = self.dataset_path / "images/right_undistorded_mask.jpg"
        self.mask = None
        if mask_file.exists():
            import cv2

            m = cv2.imread(str(mask_file), cv2.IMREAD_GRAYSCALE)
            self.mask = (m > 0).astype(np.float32)[..., None]
        self.apply_split()
