"""Dataset parser base: file lists, images, depth decode, ray-pack assembly.

Reference analog: ``dataparser::DataParser``
(include/data_loader/data_parsers/base_parser.{h,cpp}): sorted file listing,
pose loading (data/poses.py), color preload, depth decode from
png/ply/bin/pcd (base_parser.cpp:284-345), ray-from-depth math
(get_distance_ndir_zdirn, :1023-1037), per-frame downsampling to
``ds_pt_num`` and the [N, P] train ray pack (load_depths, :866-987), llff
every-8th eval split (:821-835).

Host-side numpy throughout; device transfer happens at training time.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..sensors.cameras import Camera
from ..utils.ply import read_ply_xyz
from .poses import PoseFile, load_poses


class DepthType:
    Image = 0
    PLY = 1
    BIN = 2
    PCD = 3

    EXT = {Image: ".png", PLY: ".ply", BIN: ".bin", PCD: ".pcd"}


@dataclass
class DepthPack:
    """Flattened world-space ray supervision (train_depth_pack_,
    ray_utils.h)."""

    origin: np.ndarray     # [M, 3]
    direction: np.ndarray  # [M, 3] unit
    depth: np.ndarray      # [M, 1]

    @property
    def xyz(self) -> np.ndarray:
        return self.origin + self.direction * self.depth

    def select(self, idx: np.ndarray) -> "DepthPack":
        return DepthPack(
            origin=self.origin[idx],
            direction=self.direction[idx],
            depth=self.depth[idx],
        )

    def __len__(self):
        return self.origin.shape[0]


def _num_key(p: Path):
    """Natural sort: numeric runs compare numerically (load_file_list
    sorted order)."""
    parts = re.split(r"(\d+)", p.name)
    return [int(s) if s.isdigit() else s for s in parts]


def list_files(
    directory: os.PathLike, prefix: str = "", extension: str = ""
) -> List[Path]:
    d = Path(directory)
    if not d.exists():
        return []
    out = [
        p
        for p in d.iterdir()
        if p.is_file()
        and (not prefix or p.name.startswith(prefix))
        and (not extension or p.suffix == extension)
    ]
    return sorted(out, key=_num_key)


class BaseParser:
    """Concrete parsers set paths/intrinsics then call ``load_data``."""

    def __init__(
        self,
        dataset_path: os.PathLike,
        ds_pt_num: int = 100000,
        res_scale: float = 1.0,
        llff: bool = False,
    ):
        self.dataset_path = Path(dataset_path)
        self.ds_pt_num = ds_pt_num
        self.res_scale = res_scale
        self.llff = llff

        self.camera: Camera = Camera(0, 0, 0, 0, 0, 0)
        self.depth_type: int = DepthType.Image
        self.depth_scale_inv: float = 1.0

        self.color_files: List[Path] = []
        self.depth_files: List[Path] = []
        self.color_poses: np.ndarray = np.zeros((0, 4, 4), np.float32)
        self.depth_poses: np.ndarray = np.zeros((0, 4, 4), np.float32)

        self.eval_color_files: List[Path] = []
        self.eval_depth_files: List[Path] = []
        self.eval_color_poses: np.ndarray = np.zeros((0, 4, 4), np.float32)

        self.train_ids: List[int] = []      # indices into raw lists
        self.gt_mesh_path: Optional[Path] = None
        self._undistort = None              # (camera, mapx, mapy)

    # -- images ------------------------------------------------------------

    def _maybe_undistort(self, img: np.ndarray) -> np.ndarray:
        if self._undistort is None:
            if any(self.camera.dist):
                self._undistort = self.camera.undistort_maps()
            else:
                self._undistort = (self.camera, None, None)
        cam, mx, my = self._undistort
        if mx is not None:
            import cv2

            img = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
        return img

    def get_color_image(self, idx: int, eval_set: bool = False) -> np.ndarray:
        """[H, W, 3] float32 RGB in [0, 1], undistorted + res-scaled."""
        import cv2

        files = self.eval_color_files if eval_set else self.color_files
        img = cv2.imread(str(files[idx]), cv2.IMREAD_ANYCOLOR)
        if img is None:
            raise FileNotFoundError(files[idx])
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = self._maybe_undistort(img)
        if self.res_scale != 1.0:
            img = cv2.resize(
                img,
                (self.camera.width, self.camera.height),
                interpolation=cv2.INTER_AREA,
            )
        return np.asarray(img, np.float32) / 255.0

    def get_depth_image(self, idx: int, eval_set: bool = False) -> np.ndarray:
        """DepthType.Image -> [H, W, 1] float32 depth (scaled); point types ->
        [M, 3] sensor-frame points (get_depth_image, base_parser.cpp:284-345)."""
        files = self.eval_depth_files if eval_set else self.depth_files
        path = files[idx]
        if self.depth_type == DepthType.Image:
            import cv2

            d = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH)
            if d is None:
                raise FileNotFoundError(path)
            if d.dtype == np.uint16:
                d = d.astype(np.float32) * self.depth_scale_inv
            d = d.astype(np.float32)
            if self.res_scale != 1.0:
                d = cv2.resize(
                    d,
                    (self.camera.width, self.camera.height),
                    interpolation=cv2.INTER_NEAREST,
                )
            return d[..., None]
        if self.depth_type == DepthType.PLY:
            return read_ply_xyz(path)
        if self.depth_type == DepthType.BIN:
            pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
            return pts[np.isfinite(pts).all(-1)]
        if self.depth_type == DepthType.PCD:
            return _read_pcd_xyz(path)
        raise ValueError(f"unknown depth type {self.depth_type}")

    # -- rays --------------------------------------------------------------

    def _camera_ndirs(self) -> Tuple[np.ndarray, np.ndarray]:
        """(unit dirs [H*W, 3], zdir norms [H*W, 1]) in camera frame
        (get_image_coords_zdir / get_distance_ndir_zdirn)."""
        cam = self.camera
        ys, xs = np.meshgrid(
            np.arange(cam.height) + 0.5, np.arange(cam.width) + 0.5,
            indexing="ij",
        )
        zdir = np.stack(
            [(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy, np.ones_like(xs)],
            -1,
        ).reshape(-1, 3)
        norm = np.linalg.norm(zdir, axis=-1, keepdims=True)
        return (zdir / norm).astype(np.float32), norm.astype(np.float32)

    def frame_rays(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """(distance [P, 1], world unit dirs [P, 3]) for raw frame ``idx``
        (load_depths inner loop, base_parser.cpp:923-946). Uses the native
        OpenMP library when built (gssdf_tpu.native), numpy otherwise."""
        from .. import native

        pose = self.depth_poses[idx]
        rot = pose[:3, :3]
        if self.depth_type == DepthType.Image:
            depth = self.get_depth_image(idx)
            cam = self.camera
            nat = native.depth_to_rays(
                depth[..., 0], cam.fx, cam.fy, cam.cx, cam.cy, rot
            )
            if nat is not None:
                return nat
            ndir, zn = self._camera_ndirs()
            dist = depth.reshape(-1, 1) * zn
            dirs = ndir @ rot.T
        else:
            pts = self.get_depth_image(idx)          # sensor frame
            nat = native.points_to_rays(pts, rot)
            if nat is not None:
                return nat
            dist = np.linalg.norm(pts, axis=-1, keepdims=True)
            safe = np.where(dist > 1e-9, dist, 1.0)
            dirs = (pts / safe) @ rot.T
        return dist.astype(np.float32), dirs.astype(np.float32)

    def build_depth_pack(
        self,
        min_range: float = 0.01,
        max_range: float = 1e9,
        seed: int = 0,
    ) -> DepthPack:
        """Flattened world-frame train rays, ds_pt_num per frame."""
        rng = np.random.RandomState(seed)
        origins, dirs, depths = [], [], []
        for i in self.train_ids:
            dist, d = self.frame_rays(i)
            valid = (dist[:, 0] > min_range) & (dist[:, 0] < max_range)
            dist, d = dist[valid], d[valid]
            if dist.shape[0] == 0:
                continue
            if self.ds_pt_num < dist.shape[0]:
                sel = rng.randint(0, dist.shape[0], self.ds_pt_num)
                dist, d = dist[sel], d[sel]
            pos = self.depth_poses[i][:3, 3]
            origins.append(np.broadcast_to(pos, d.shape).copy())
            dirs.append(d)
            depths.append(dist)
        if not origins:
            return DepthPack(
                origin=np.zeros((0, 3), np.float32),
                direction=np.zeros((0, 3), np.float32),
                depth=np.zeros((0, 1), np.float32),
            )
        return DepthPack(
            origin=np.concatenate(origins),
            direction=np.concatenate(dirs),
            depth=np.concatenate(depths),
        )

    # -- split -------------------------------------------------------------

    def apply_split(self):
        """llff: every 8th frame held out (load_colors,
        base_parser.cpp:821-835); else all frames train."""
        n = len(self.color_files)
        if self.llff:
            self.train_ids = [i for i in range(n) if i % 8 != 0]
        else:
            self.train_ids = list(range(n))

    # -- API used by the trainer -------------------------------------------

    @property
    def num_train(self) -> int:
        return len(self.train_ids)

    def train_frame(self, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(gt color [H, W, 3], pose c2w [4, 4]) for train index ``k``."""
        i = self.train_ids[k]
        return self.get_color_image(i), self.color_poses[i]

    def load_data(self):  # pragma: no cover - implemented by subclasses
        raise NotImplementedError


def _read_pcd_xyz(path: os.PathLike) -> np.ndarray:
    """Minimal PCD reader (ascii + binary), xyz fields only."""
    with open(path, "rb") as f:
        header: Dict[str, List[str]] = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, *vals = line.split()
            header[key.upper()] = vals
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n = int(header["POINTS"][0])
        fmt = header["DATA"][0]

        np_types = []
        for name, sz, tp, cnt in zip(fields, sizes, types, counts):
            base = {"F": "f", "I": "i", "U": "u"}[tp] + str(sz)
            np_types.append((name, "<" + base, (cnt,)) if cnt > 1 else (name, "<" + base))
        rec = np.dtype(np_types)
        if fmt == "ascii":
            data = np.loadtxt(f, dtype=rec, max_rows=n)
        elif fmt == "binary":
            data = np.frombuffer(f.read(n * rec.itemsize), dtype=rec, count=n)
        else:
            raise ValueError(f"unsupported PCD DATA format: {fmt}")
        pts = np.stack(
            [data["x"], data["y"], data["z"]], axis=-1
        ).astype(np.float32)
        return pts[np.isfinite(pts).all(-1)]
