"""Data layer: PLY/PCD IO, parsers on synthetic datasets, ray packs."""

import os

import numpy as np
import pytest

from gssdf_tpu.config import Config, DatasetType
from gssdf_tpu.data.base import DepthType, list_files
from gssdf_tpu.data.loader import DataLoader, camera_from_config
from gssdf_tpu.data.parsers.colmap import load_colmap_cameras
from gssdf_tpu.data.poses import rot_to_quat_np
from gssdf_tpu.sensors.cameras import Camera
from gssdf_tpu.utils.ply import read_ply, read_ply_xyz, write_ply, write_ply_xyz

cv2 = pytest.importorskip("cv2")


def test_ply_roundtrip_binary(tmp_path):
    xyz = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    rgb = (np.random.RandomState(1).rand(100, 3) * 255).astype(np.uint8)
    p = tmp_path / "pts.ply"
    write_ply_xyz(p, xyz, rgb)
    back = read_ply(p)
    np.testing.assert_allclose(back["vertex.x"], xyz[:, 0])
    np.testing.assert_array_equal(back["vertex.red"], rgb[:, 0])
    np.testing.assert_allclose(read_ply_xyz(p), xyz)


def test_ply_roundtrip_mesh_ascii(tmp_path):
    verts = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    p = tmp_path / "mesh.ply"
    write_ply(
        p,
        {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]},
        faces=faces,
        ascii_fmt=True,
    )
    back = read_ply(p)
    np.testing.assert_allclose(read_ply_xyz(p), verts, atol=1e-6)
    np.testing.assert_array_equal(back["face"], faces)


def test_list_files_natural_sort(tmp_path):
    for n in ["frame2.jpg", "frame10.jpg", "frame1.jpg"]:
        (tmp_path / n).touch()
    names = [p.name for p in list_files(tmp_path, "frame", ".jpg")]
    assert names == ["frame1.jpg", "frame2.jpg", "frame10.jpg"]


def _write_replica(tmp_path, n_frames=3, W=1200, H=680):
    results = tmp_path / "results"
    results.mkdir(parents=True)
    poses = []
    with open(tmp_path / "traj.txt", "w") as f:
        for i in range(n_frames):
            pose = np.eye(4)
            pose[0, 3] = 0.1 * i
            poses.append(pose)
            f.write(" ".join(str(v) for v in pose.reshape(-1)) + "\n")
    img = np.full((H, W, 3), 128, np.uint8)
    depth_m = 2.0
    depth_raw = np.full((H, W), depth_m * 6553.5, np.uint16)
    for i in range(n_frames):
        cv2.imwrite(str(results / f"frame{i:06d}.jpg"), img)
        cv2.imwrite(str(results / f"depth{i:06d}.png"), depth_raw)
    return np.asarray(poses, np.float32)


def test_replica_parser_and_loader(tmp_path):
    poses = _write_replica(tmp_path)
    cfg = Config()
    cfg.dataset_type = DatasetType.Replica
    cfg.dataset_path = str(tmp_path)
    cfg.ds_pt_num = 500
    cfg.finalize_derived()
    dl = DataLoader(cfg)
    assert dl.num_train == 3
    assert dl.camera.width == 1200 and dl.camera.fx == 600.0

    color, pose = dl.train_frame(1)
    assert color.shape == (680, 1200, 3)
    np.testing.assert_allclose(color, 128 / 255.0, atol=1e-3)
    np.testing.assert_allclose(pose, poses[1], atol=1e-6)

    pack = dl.depth_pack()
    assert len(pack) == 3 * 500
    # depth png holds z-depth 2.0 -> ray distance = 2.0 * |zdir|, so the
    # z-component of the reconstructed point must be ~2.0 + origin_z
    xyz = pack.xyz
    np.testing.assert_allclose(xyz[:, 2], 2.0, atol=1e-3)
    # origins follow the per-frame pose translations
    np.testing.assert_allclose(
        np.unique(pack.origin[:, 0]), [0.0, 0.1, 0.2], atol=1e-6
    )


def test_exported_bag_parser(tmp_path):
    from gssdf_tpu.data.parsers.exported_bag import ExportedBagParser

    (tmp_path / "images").mkdir()
    (tmp_path / "depths").mkdir()
    n = 3
    with open(tmp_path / "color_poses.txt", "w") as fc, open(
        tmp_path / "depth_poses.txt", "w"
    ) as fd:
        for i in range(n):
            pose = np.eye(4)
            pose[1, 3] = float(i)
            for row in pose:
                line = " ".join(f"{v:.6f}" for v in row) + "\n"
                fc.write(line)
                fd.write(line)
            cv2.imwrite(
                str(tmp_path / "images" / f"{i}.png"),
                np.zeros((24, 32, 3), np.uint8),
            )
            pts = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 3.0]], np.float32)
            write_ply_xyz(tmp_path / "depths" / f"{i}.ply", pts)

    cam = Camera(fx=20, fy=20, cx=16, cy=12, width=32, height=24)
    p = ExportedBagParser(tmp_path, cam, ds_pt_num=10, llff=False)
    assert p.num_train == 3
    pack = p.build_depth_pack()
    assert len(pack) == 6
    # cloud points are sensor-frame; pose translation y=i shifts origins
    np.testing.assert_allclose(np.unique(pack.origin[:, 1]), [0.0, 1.0, 2.0])
    np.testing.assert_allclose(
        np.sort(pack.depth[:2, 0]), [1.0, 3.0], atol=1e-6
    )


def test_colmap_cameras_txt(tmp_path):
    p = tmp_path / "cameras.txt"
    p.write_text(
        "# comment\n"
        "1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n"
        "2 OPENCV_FISHEYE 800 600 400 410 400 300 0.1 0.01 0.001 0.0001\n"
    )
    cams = load_colmap_cameras(p)
    assert cams[1].fx == 500.0 and cams[1].width == 640
    assert cams[2].model == 1 and cams[2].dist[0] == 0.1


def test_colmap_parser_synthetic(tmp_path):
    from gssdf_tpu.data.parsers.colmap import ColmapParser

    (tmp_path / "sparse/0").mkdir(parents=True)
    (tmp_path / "images").mkdir()
    (tmp_path / "depths").mkdir()
    (tmp_path / "sparse/0/cameras.txt").write_text(
        "1 PINHOLE 32 24 20 20 16 12\n"
    )
    # images.txt: pose lines alternate with (empty) keypoint lines; w2c pose
    lines = ["# images"]
    n = 3
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = -0.5 * i  # w2c translation
        q = rot_to_quat_np(T[:3, :3])
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} "
            f"{T[0,3]} {T[1,3]} {T[2,3]} 1 img{i}.png"
        )
        lines.append("")  # keypoints line
        cv2.imwrite(
            str(tmp_path / "images" / f"img{i}.png"),
            np.zeros((24, 32, 3), np.uint8),
        )
        write_ply_xyz(
            tmp_path / "depths" / f"{i}.ply",
            np.array([[0.0, 0.0, 2.0]], np.float32),
        )
    (tmp_path / "sparse/0/images.txt").write_text("\n".join(lines))
    with open(tmp_path / "depth_poses.txt", "w") as fd:
        for i in range(n):
            for row in np.eye(4):
                fd.write(" ".join(str(v) for v in row) + "\n")

    p = ColmapParser(tmp_path, llff=False)
    assert len(p.color_files) == 3
    # c2w = inv(w2c): translation +0.5*i
    np.testing.assert_allclose(p.color_poses[2][0, 3], 1.0, atol=1e-5)
    assert p.camera.fx == 20


def test_camera_from_config():
    cfg = Config()
    cfg.camera = {
        "model": 0, "width": 640, "height": 512,
        "fx": 588.1, "fy": 588.1, "cx": 296.0, "cy": 254.5,
        "d0": -0.13, "d1": 0.15, "d2": 0.0, "d3": 0.0, "d4": 0.0,
    }
    cam = camera_from_config(cfg)
    assert cam.width == 640 and abs(cam.dist[0] + 0.13) < 1e-9


def test_pcd_reader(tmp_path):
    from gssdf_tpu.data.base import _read_pcd_xyz

    pts = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    # ascii pcd
    p = tmp_path / "a.pcd"
    with open(p, "w") as f:
        f.write(
            "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n"
        )
        for r in pts:
            f.write(" ".join(str(v) for v in r) + "\n")
    np.testing.assert_allclose(_read_pcd_xyz(p), pts)
    # binary pcd
    pb = tmp_path / "b.pcd"
    with open(pb, "wb") as f:
        f.write(
            b"VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            b"COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA binary\n"
        )
        f.write(pts.astype("<f4").tobytes())
    np.testing.assert_allclose(_read_pcd_xyz(pb), pts)
