import numpy as np
import jax.numpy as jnp

from gssdf_tpu.coordinates import (
    SystemType,
    change_camera_system,
    change_world_system,
    invert_pose,
)
from gssdf_tpu.data.poses import (
    load_poses,
    quat_to_rot_np,
    rot_to_quat_np,
)
from gssdf_tpu.sensors.cameras import (
    Camera,
    camera_rays,
    depth_to_normal,
    depth_to_points,
    rays_from_pose,
)


def _cam():
    return Camera(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)


def test_camera_center_ray():
    cam = _cam()
    ndir, n = camera_rays(cam)
    # pixel at principal point minus half-offset: coords are pixel centers,
    # so the exact principal-point ray exists only if cx-0.5 is integral
    zdirs = np.asarray(ndir * n).reshape(48, 64, 3)
    # ray through pixel (24, 32) has direction ((32.5-32)/100, (24.5-24)/100, 1)
    np.testing.assert_allclose(zdirs[24, 32], [0.005, 0.005, 1.0], atol=1e-6)


def test_rays_from_pose_identity():
    cam = _cam()
    pose = np.eye(4, dtype=np.float32)
    ray_o, ray_d, n = rays_from_pose(cam, jnp.asarray(pose))
    assert ray_o.shape == (64 * 48, 3)
    np.testing.assert_allclose(np.asarray(ray_o), 0.0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ray_d), axis=-1), 1.0, atol=1e-6
    )


def test_depth_to_points_plane():
    cam = _cam()
    pose = np.eye(4, dtype=np.float32)
    depth = jnp.full((48, 64, 1), 2.0)
    pts = depth_to_points(cam, jnp.asarray(pose), depth)
    np.testing.assert_allclose(np.asarray(pts)[..., 2], 2.0, atol=1e-6)


def test_depth_to_normal_plane():
    cam = _cam()
    pose = np.eye(4, dtype=np.float32)
    depth = jnp.full((48, 64, 1), 2.0)
    normals = np.asarray(depth_to_normal(cam, jnp.asarray(pose), depth))
    inner = normals[1:-1, 1:-1]
    # plane at z=2 facing the camera: normal = -z (cross(dx, dy) with y-down)
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)


def test_invert_pose():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    R = quat_to_rot_np(q)
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = [1.0, 2.0, 3.0]
    inv = invert_pose(pose)
    np.testing.assert_allclose(inv @ pose, np.eye(4), atol=1e-6)


def test_change_systems():
    pose = np.eye(4)
    out = change_camera_system(pose, SystemType.Blender)
    # blender camera: y-up, -z lookat -> flips y and z axes
    np.testing.assert_allclose(np.diag(out[:3, :3]), [1, -1, -1])
    out = change_world_system(pose, SystemType.OpenCV)
    np.testing.assert_allclose(out, np.eye(4))


def test_quat_np_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = quat_to_rot_np(q)
        q2 = rot_to_quat_np(R)
        np.testing.assert_allclose(q, q2, atol=1e-6)


def test_load_poses_formats(tmp_path):
    # type 3: TUM
    tum = tmp_path / "traj_tum.txt"
    tum.write_text("0.0 1 2 3 0 0 0 1\n1.0 4 5 6 0 0 0 1\n")
    pf = load_poses(tum, pose_type=3)
    assert pf.poses.shape == (2, 4, 4)
    np.testing.assert_allclose(pf.poses[0][:3, 3], [1, 2, 3])
    np.testing.assert_allclose(pf.poses[0][:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(pf.timestamps, [0.0, 1.0])

    # type 1: 16-col
    m = np.eye(4)
    m[:3, 3] = [7, 8, 9]
    f16 = tmp_path / "traj16.txt"
    f16.write_text(" ".join(str(v) for v in m.reshape(-1)) + "\n")
    pf = load_poses(f16, pose_type=1)
    np.testing.assert_allclose(pf.poses[0], m, atol=1e-6)

    # type 2: kitti 12-col
    f12 = tmp_path / "traj12.txt"
    f12.write_text(" ".join(str(v) for v in m[:3].reshape(-1)) + "\n")
    pf = load_poses(f12, pose_type=2)
    np.testing.assert_allclose(pf.poses[0], m, atol=1e-6)

    # type 0: 4 lines per pose
    f4 = tmp_path / "traj4.txt"
    f4.write_text("\n".join(" ".join(str(v) for v in row) for row in m) + "\n")
    pf = load_poses(f4, pose_type=0)
    np.testing.assert_allclose(pf.poses[0], m, atol=1e-6)

    # type 4: colmap images.txt (w2c + keypoint lines), inverse=True
    colmap = tmp_path / "images.txt"
    colmap.write_text(
        "# comment\n1 1 0 0 0 1 2 3 1 img001.png\n0 0 0\n"
    )
    pf = load_poses(colmap, pose_type=4, inverse=True)
    assert pf.image_names == ["img001.png"]
    assert pf.camera_ids == [1]
    np.testing.assert_allclose(pf.poses[0][:3, 3], [-1, -2, -3], atol=1e-6)

    # type 5: t qw qx qy qz x y z
    f5 = tmp_path / "stamped.txt"
    f5.write_text("2.5 1 0 0 0 1 2 3\n")
    pf = load_poses(f5, pose_type=5)
    np.testing.assert_allclose(pf.timestamps, [2.5])
    np.testing.assert_allclose(pf.poses[0][:3, 3], [1, 2, 3])

    # type 6: csv
    f6 = tmp_path / "csv.txt"
    f6.write_text("0,2.5,1,0,0,0,1,2,3\n")
    pf = load_poses(f6, pose_type=6)
    np.testing.assert_allclose(pf.poses[0][:3, 3], [1, 2, 3])


def test_undistort_maps_pinhole_radial():
    """Radial undistortion: a synthetic distorted checker remaps to straight
    edges; center pixel is a fixed point; no-dist cameras return None maps."""
    import cv2
    from gssdf_tpu.sensors.cameras import Camera

    cam0 = Camera(fx=100.0, fy=100.0, cx=64, cy=48, width=128, height=96)
    c, mx, my = cam0.undistort_maps()
    assert mx is None and my is None and c is cam0

    cam = Camera(
        fx=100.0, fy=100.0, cx=64, cy=48, width=128, height=96,
        dist=(-0.2, 0.05, 0.0, 0.0, 0.0),
    )
    new_cam, mx, my = cam.undistort_maps()
    assert mx is not None and mx.shape[:2] == (96, 128)
    # CV_16SC2: mx[y, x] is the packed (src_x, src_y) pair; the principal
    # point is (numerically) a fixed point of the remap
    np.testing.assert_allclose(mx[48, 64], [64, 48], atol=1.0)


def test_undistort_maps_fisheye():
    import cv2
    from gssdf_tpu.sensors.cameras import Camera

    cam = Camera(
        fx=90.0, fy=90.0, cx=64, cy=48, width=128, height=96,
        model=1, dist=(0.05, -0.01, 0.0, 0.0, 0.0),
    )
    new_cam, mx, my = cam.undistort_maps()
    assert mx is not None and np.isfinite(mx).all()
    np.testing.assert_allclose(mx[48, 64], [64, 48], atol=1.5)
