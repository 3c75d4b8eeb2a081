"""Native C++ data-path library vs the numpy reference implementations."""

import numpy as np
import pytest

from gssdf_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_depth_to_rays_matches_numpy():
    h, w = 24, 32
    fx = fy = 20.0
    cx, cy = 16.0, 12.0
    rng = np.random.RandomState(0)
    depth = rng.uniform(0.5, 5.0, (h, w)).astype(np.float32)
    th = 0.3
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    dist, dirs = native.depth_to_rays(depth, fx, fy, cx, cy, rot)

    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    zdir = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    zn = np.linalg.norm(zdir, axis=-1, keepdims=True)
    ref_dist = (depth[..., None] * zn).reshape(-1, 1)
    ref_dirs = ((zdir / zn) @ rot.T).reshape(-1, 3)
    np.testing.assert_allclose(dist, ref_dist, rtol=1e-5)
    np.testing.assert_allclose(dirs, ref_dirs, rtol=1e-5, atol=1e-6)


def test_points_to_rays_matches_numpy():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    rot = np.eye(3, dtype=np.float32)
    dist, dirs = native.points_to_rays(pts, rot)
    ref = np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(dist, ref, rtol=1e-5)
    np.testing.assert_allclose(dirs * dist, pts, rtol=1e-4, atol=1e-5)


def test_voxel_downsample_matches_numpy():
    from gssdf_tpu.eval.mesh_metrics import voxel_downsample as np_vd

    rng = np.random.RandomState(2)
    pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    out = native.voxel_downsample(pts, 0.2)
    ref = np_vd(pts, 0.2)
    assert out.shape[0] == ref.shape[0]
    # same cell means regardless of order
    np.testing.assert_allclose(
        np.sort(out, axis=0), np.sort(ref, axis=0), atol=1e-5
    )


def test_occupancy_matches_python():
    from gssdf_tpu.fields.occupancy import build_occupancy_grid
    from gssdf_tpu.fields.sdf_field import MapGeometry

    rng = np.random.RandomState(3)
    pts = rng.uniform(-2, 2, (2000, 3)).astype(np.float32)
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=4.0)
    res = 32
    grid_native = native.occupancy_from_points(
        pts, np.zeros(3, np.float32), 4.0, res
    )
    grid_py = build_occupancy_grid(pts, geom, res, dilate=False)
    np.testing.assert_array_equal(grid_native, np.asarray(grid_py.packed))


def test_threads():
    lib = native.get_lib()
    assert lib.native_num_threads() >= 1
