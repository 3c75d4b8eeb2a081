"""DataLoader facade: dataset-type dispatch + trainer-facing API.

Reference analog: ``dataloader::DataLoader`` (data_loader.{h,cpp}:20-74):
dispatch by the DatasetType enum (Replica=0, R3live=1, NeuralRGBD=2,
Kitti=3, Fastlivo=4, Spires=5, Colmap=6), hand the trainer per-frame color +
pose and the flattened depth ray pack.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..config import Config, DatasetType
from ..sensors.cameras import Camera
from .base import BaseParser, DepthPack, DepthType
from .parsers.colmap import ColmapParser
from .parsers.exported_bag import ExportedBagParser
from .parsers.kitti import KittiParser
from .parsers.neuralrgbd import NeuralRGBDParser
from .parsers.replica import ReplicaParser
from .parsers.spires import SpiresParser


def camera_from_config(cfg: Config) -> Optional[Camera]:
    c = cfg.camera or {}
    if not c or "fx" not in c:
        return None
    return Camera(
        fx=float(c["fx"]),
        fy=float(c["fy"]),
        cx=float(c["cx"]),
        cy=float(c["cy"]),
        width=int(c["width"]),
        height=int(c["height"]),
        model=int(c.get("model", 0)),
        dist=tuple(
            float(c.get(f"d{i}", 0.0)) for i in range(5)
        ),
    )


# R3live hardcoded intrinsics (r3live_parser.hpp:8-52)
_R3LIVE_CAMERA = Camera(
    fx=863.4241, fy=863.4171, cx=640.6808, cy=518.3392,
    width=1280, height=1024,
    dist=(-0.1080, 0.1050, -1.2872e-04, 5.7923e-05, -0.0222),
)


def make_parser(cfg: Config) -> BaseParser:
    t = cfg.dataset_type
    path = cfg.dataset_path
    kw = dict(
        ds_pt_num=cfg.ds_pt_num, res_scale=cfg.res_scale, llff=cfg.llff
    )
    if t == DatasetType.Replica:
        return ReplicaParser(path, **kw)
    if t == DatasetType.NeuralRGBD:
        return NeuralRGBDParser(path, **kw)
    if t == DatasetType.Kitti:
        return KittiParser(path, **kw)
    if t in (DatasetType.Fastlivo, DatasetType.R3live):
        cam = camera_from_config(cfg) or (
            _R3LIVE_CAMERA if t == DatasetType.R3live else None
        )
        if cam is None:
            raise ValueError(
                "dataset type Fastlivo needs camera intrinsics in the run"
                " config"
            )
        if str(path).endswith(".bag"):
            # auto-export next to the bag (Rosbag ctor behavior,
            # rosbag_parser.hpp:31-58)
            from .bag_convert import FASTLIVO_TOPICS, R3LIVE_TOPICS, convert_bag

            out = Path(path).with_suffix("")
            if not (out / "color_poses.txt").exists():
                convert_bag(
                    path, out, cam,
                    T_C_L=np.asarray(cfg.T_C_L) if cfg.T_C_L is not None else np.eye(4),
                    T_B_L=np.asarray(cfg.T_B_L) if cfg.T_B_L is not None else np.eye(4),
                    topics=R3LIVE_TOPICS if t == DatasetType.R3live else FASTLIVO_TOPICS,
                )
            path = out
        return ExportedBagParser(path, cam, **kw)
    if t == DatasetType.Spires:
        cam = camera_from_config(cfg)
        if cam is None or cfg.T_C_L is None or cfg.T_B_L is None:
            raise ValueError(
                "dataset type Spires needs camera + T_C_L/T_B_L extrinsics"
                " in the run config"
            )
        return SpiresParser(
            path, cam, np.asarray(cfg.T_C_L), np.asarray(cfg.T_B_L),
            max_time_diff_camera_and_pose=cfg.max_time_diff_camera_and_pose,
            max_time_diff_lidar_and_pose=cfg.max_time_diff_lidar_and_pose,
            **kw,
        )
    if t == DatasetType.Colmap:
        cam = camera_from_config(cfg)
        return ColmapParser(path, camera=cam, **kw)
    raise ValueError(f"unknown dataset_type {t}")


class DataLoader:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.parser = make_parser(cfg)
        self._pack: Optional[DepthPack] = None

    @property
    def camera(self) -> Camera:
        return self.parser.camera

    @property
    def num_train(self) -> int:
        return self.parser.num_train

    def depth_pack(self) -> DepthPack:
        """Flattened world-frame depth rays, capped at ``max_pt_num``
        (batch_train, neural_mapping.cpp:771-808)."""
        if self._pack is None:
            pack = self.parser.build_depth_pack(
                min_range=self.cfg.min_range,
                max_range=self.cfg.max_range,
                seed=self.cfg.seed,
            )
            cap = self.cfg.max_pt_num
            if cap and cap > 0 and len(pack) > cap:
                sel = np.random.RandomState(self.cfg.seed).choice(
                    len(pack), cap, replace=False
                )
                pack = pack.select(np.sort(sel))
            self._pack = pack
        return self._pack

    def train_frame(self, k: int):
        return self.parser.train_frame(k)

    def eval_frames(self):
        """(color, pose) pairs of the eval split (eval dir or llff
        holdouts)."""
        p = self.parser
        if p.eval_color_files:
            for i in range(len(p.eval_color_files)):
                yield p.get_color_image(i, eval_set=True), p.eval_color_poses[i]
        elif self.cfg.llff:
            n = len(p.color_files)
            for i in range(n):
                if i % 8 == 0:
                    yield p.get_color_image(i), p.color_poses[i]
