"""KITTI odometry + Oxford-Spires parsers on synthetic fixtures."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gssdf_tpu.sensors.cameras import Camera


def test_kitti_parser(tmp_path):
    from gssdf_tpu.data.parsers.kitti import KittiParser

    base = tmp_path
    seq = "00"
    calib_dir = base / "data_odometry_calib/dataset/sequences" / seq
    pose_dir = base / "data_odometry_poses/dataset/poses"
    color_dir = base / "data_odometry_color/dataset/sequences" / seq / "image_2"
    velo_dir = base / "data_odometry_velodyne/dataset/sequences" / seq / "velodyne"
    for d in (calib_dir, pose_dir, color_dir, velo_dir):
        d.mkdir(parents=True)

    fx = fy = 700.0
    cx, cy = 600.0, 180.0
    p2 = [fx, 0, cx, -0.35 * fx, 0, fy, cy, 0, 0, 0, 1, 0]
    tr = list(np.eye(4)[:3].reshape(-1))
    (calib_dir / "calib.txt").write_text(
        "P2: " + " ".join(map(str, p2)) + "\n"
        "Tr: " + " ".join(map(str, tr)) + "\n"
    )
    n = 3
    with open(pose_dir / f"{seq}.txt", "w") as f:
        for i in range(n):
            pose = np.eye(4)
            pose[2, 3] = 1.0 * i      # KITTI forward is +z in cam0 frame
            f.write(" ".join(map(str, pose[:3].reshape(-1))) + "\n")
    for i in range(n):
        cv2.imwrite(str(color_dir / f"{i:06d}.png"),
                    np.zeros((376, 1241, 3), np.uint8))
        pts = np.zeros((100, 4), np.float32)
        pts[:, 0] = np.linspace(2.0, 10.0, 100)   # x forward in velodyne
        pts.tofile(velo_dir / f"{i:06d}.bin")

    p = KittiParser(velo_dir.parent, ds_pt_num=200, llff=False)
    assert p.num_train == n
    assert p.camera.fx == fx
    # baseline shift separates cam2 from cam0/lidar by 0.35 m (the
    # direction rotates with the KITTI->world system change)
    np.testing.assert_allclose(
        np.linalg.norm(p.color_poses[0][:3, 3] - p.depth_poses[0][:3, 3]),
        0.35, atol=1e-6,
    )
    pack = p.build_depth_pack()
    assert len(pack) > 0
    # velodyne x-forward points land in front of the sensor
    assert float(np.asarray(pack.depth).min()) > 0


def test_spires_parser_exports_then_reloads(tmp_path):
    from gssdf_tpu.data.parsers.spires import SpiresParser

    (tmp_path / "images" / "cam0").mkdir(parents=True)
    (tmp_path / "lidar-clouds").mkdir()
    cam = Camera(fx=100.0, fy=100.0, cx=64, cy=48, width=128, height=96)
    n = 3
    with open(tmp_path / "gt-tum.txt", "w") as f:
        for i in range(n):
            t = 10.0 + i
            f.write(f"{t} {0.5 * i} 0 0 0 0 0 1\n")
            cv2.imwrite(
                str(tmp_path / "images" / "cam0" / f"{t:.1f}.jpg"),
                np.full((96, 128, 3), 90, np.uint8),
            )
            # ascii pcd: one point 2 m ahead (lidar x)
            (tmp_path / "lidar-clouds" / f"{t:.1f}.pcd").write_text(
                "VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                "POINTS 2\nDATA ascii\n2.0 0 0\n3.0 0.1 0\n"
            )

    p = SpiresParser(
        tmp_path, cam, T_C_L=np.eye(4), T_B_L=np.eye(4),
        ds_pt_num=10, llff=False,
    )
    assert p.num_train == n
    assert (tmp_path / "color_poses.txt").exists()
    assert (tmp_path / "undistorted_images").is_dir()
    np.testing.assert_allclose(p.color_poses[2][0, 3], 1.0, atol=1e-6)
    pack = p.build_depth_pack()
    assert len(pack) == 2 * n

    # second construction must REUSE the export (no images/ needed)
    import shutil

    shutil.rmtree(tmp_path / "images")
    p2 = SpiresParser(
        tmp_path, cam, T_C_L=np.eye(4), T_B_L=np.eye(4),
        ds_pt_num=10, llff=False,
    )
    assert p2.num_train == n
