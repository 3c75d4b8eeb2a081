"""Dataset -> COLMAP / nerfstudio format export.

Reference analog: ``DataLoader::export_as_colmap_format[_for_nerfstudio]``
and ``export_image`` (data_loader.cpp:206-524; binary writers per
include/utils/bin_utils/endian.h): writes sparse/0/cameras.{txt,bin},
images.{txt,bin} (world-to-camera quaternions), points3D.{bin,ply} from the
downsampled train cloud, copies images (llff holdouts into test_colmap/).
"""

from __future__ import annotations

import shutil
import struct
from pathlib import Path
from typing import Optional

import numpy as np

from .base import BaseParser
from .poses import rot_to_quat_np


def _write_cameras_bin(path, cam, camera_id=1):
    """COLMAP cameras.bin: u64 count; per camera u32 id, i32 model
    (1=PINHOLE), u64 w, u64 h, f64 params (data_loader.cpp:333-357)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", camera_id, 1))
        f.write(struct.pack("<QQ", cam.width, cam.height))
        f.write(struct.pack("<dddd", cam.fx, cam.fy, cam.cx, cam.cy))


def _write_cameras_txt(path, cam, camera_id=1):
    with open(path, "w") as f:
        d = cam.dist
        f.write(
            f"{camera_id} PINHOLE {cam.width} {cam.height} "
            f"{cam.fx} {cam.fy} {cam.cx} {cam.cy} "
            f"{d[0]} {d[1]} {d[2]} {d[3]}\n"
        )


def _write_images(path, entries, bin: bool):
    """entries: list of (image_id, qvec wxyz, tvec, camera_id, name) with
    world-to-camera pose."""
    if bin:
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(entries)))
            for iid, q, t, cid, name in entries:
                f.write(struct.pack("<i", iid))
                f.write(struct.pack("<dddd", *q))
                f.write(struct.pack("<ddd", *t))
                f.write(struct.pack("<i", cid))
                f.write(name.encode() + b"\x00")
                f.write(struct.pack("<Q", 0))
    else:
        with open(path, "w") as f:
            f.write("# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
            for iid, q, t, cid, name in entries:
                f.write(
                    f"{iid} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {cid} {name}\n\n"
                )


def _write_points3d_bin(path, points):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for i, p in enumerate(points):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *[float(v) for v in p]))
            f.write(struct.pack("<BBB", 255, 255, 255))
            f.write(struct.pack("<d", 0.0))
            f.write(struct.pack("<Q", 0))


def export_colmap(
    parser: BaseParser,
    out_root: Optional[Path] = None,
    bin: bool = True,
    llff: bool = False,
    nerfstudio: bool = False,
    max_points: int = 2_000_000,
):
    """Export the parsed dataset as a COLMAP workspace.

    llff=True splits every-8th frame into a sibling ``test_colmap/``.
    nerfstudio=True uses the nerfstudio tree (colmap/sparse/0 + train_/eval_
    name prefixes, no test split).
    """
    root = Path(out_root) if out_root else parser.dataset_path
    top = root / ("nerfstudio" if nerfstudio else "colmap")
    if top.exists():
        print(f"Colmap format already exists at {top}")
        return top
    sparse = (top / "colmap/sparse/0") if nerfstudio else (top / "sparse/0")
    sparse.mkdir(parents=True)
    test_top = root / "test_colmap"
    test_sparse = test_top / "sparse/0"
    if llff:
        test_sparse.mkdir(parents=True)

    cam = parser.camera
    if bin and not nerfstudio:
        _write_cameras_bin(sparse / "cameras.bin", cam)
        if llff:
            shutil.copyfile(
                sparse / "cameras.bin", test_sparse / "cameras.bin"
            )
    else:
        _write_cameras_txt(sparse / "cameras.txt", cam)
        if llff:
            shutil.copyfile(
                sparse / "cameras.txt", test_sparse / "cameras.txt"
            )

    def pose_to_w2c(pose):
        w2c = np.linalg.inv(np.asarray(pose, np.float64))
        q = rot_to_quat_np(w2c[:3, :3])
        return q, w2c[:3, 3]

    img_dir = top / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    if llff:
        (test_top / "images").mkdir(parents=True, exist_ok=True)

    train_entries, test_entries = [], []
    prefix = "train_" if nerfstudio else ""
    for i, (fp, pose) in enumerate(zip(parser.color_files, parser.color_poses)):
        q, t = pose_to_w2c(pose)
        name = prefix + Path(fp).name
        is_test = llff and (i % 8 == 0)
        dst = (test_top if is_test else top) / "images" / name
        shutil.copyfile(fp, dst)
        entry = (i + 1, q, t, 1, name)
        (test_entries if is_test else train_entries).append(entry)

    if nerfstudio:
        ep = "eval_"
        for i, fp in enumerate(parser.eval_color_files):
            q, t = pose_to_w2c(parser.eval_color_poses[i])
            name = ep + Path(fp).name
            shutil.copyfile(fp, img_dir / name)
            train_entries.append((len(train_entries) + 1, q, t, 1, name))

    ext = "bin" if bin else "txt"
    _write_images(sparse / f"images.{ext}", train_entries, bin)
    if llff:
        _write_images(test_sparse / f"images.{ext}", test_entries, bin)

    pack = parser.build_depth_pack()
    pts = pack.xyz
    step = max(len(pts) // max_points, 1)
    pts = pts[::step]
    if bin:
        _write_points3d_bin(sparse / "points3D.bin", pts)
    else:
        from ..utils.ply import write_ply_xyz

        write_ply_xyz(sparse / "points3D.ply", pts)
    print(f"Exported COLMAP workspace: {top} ({len(train_entries)} images)")
    return top
