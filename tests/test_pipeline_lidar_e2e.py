"""End-to-end pipeline on a LiDAR-style (FAST-LIVO exported) dataset.

The RGB-D e2e (test_pipeline_e2e.py) covers the depth-IMAGE branch; this
covers the reference's LiDAR branch (rosbag_parser.hpp:229-287 reload
semantics): ``images/*.png`` + sensor-frame ``depths/*.ply`` clouds with
SEPARATE color/depth pose streams, camera intrinsics from the run config,
dataset type Fastlivo. Asserts the full batch_train produces a wall-hugging
mesh and finite render metrics.
"""

import json
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gssdf_tpu.config import load_config
from gssdf_tpu.utils.ply import write_ply_xyz

W, H = 240, 136
FX = FY = 120.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5
WALL_Z = 3.0


def _color_frame(pose):
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    z = WALL_Z - pose[2, 3]
    wx = (xs - CX) / FX * z + pose[0, 3]
    wy = (ys - CY) / FY * z + pose[1, 3]
    checker = ((np.floor(wx * 2) + np.floor(wy * 2)) % 2).astype(bool)
    img = np.zeros((H, W, 3), np.uint8)
    img[checker] = (40, 90, 200)
    img[~checker] = (220, 180, 60)
    return img


def _lidar_cloud(depth_pose, rng, n=4000):
    """Random wall hits, expressed in the DEPTH SENSOR frame."""
    # random directions inside the camera-ish frustum, sensor at depth_pose
    dx = rng.uniform(-0.8, 0.8, n)
    dy = rng.uniform(-0.5, 0.5, n)
    d = np.stack([dx, dy, np.ones(n)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_w = depth_pose[:3, 3]
    d_w = d @ depth_pose[:3, :3].T
    t = (WALL_Z - o_w[2]) / d_w[:, 2]
    keep = (t > 0.2) & (t < 20.0)
    p_w = o_w[None] + t[keep, None] * d_w[keep]
    # back to sensor frame
    R, tr = depth_pose[:3, :3], depth_pose[:3, 3]
    return (p_w - tr[None]) @ R


def _write_poses(path, poses):
    with open(path, "w") as f:
        for p in poses:
            for row in p:
                f.write(" ".join(str(x) for x in row) + "\n")


def _make_dataset(root: Path, n_frames=5):
    (root / "images").mkdir(parents=True)
    (root / "depths").mkdir()
    rng = np.random.RandomState(3)
    color_poses, depth_poses = [], []
    for i in range(n_frames):
        pose = np.eye(4)
        pose[0, 3] = 0.2 * (i - n_frames / 2) / n_frames
        pose[1, 3] = 0.04 * rng.randn()
        color_poses.append(pose)
        # depth sensor displaced from the camera (separate pose stream,
        # the exported T_B_L-composed pose in the reference layout)
        dpose = pose.copy()
        dpose[0, 3] += 0.05
        depth_poses.append(dpose)
        cv2.imwrite(str(root / "images" / f"{i:06d}.png"), _color_frame(pose))
        write_ply_xyz(
            root / "depths" / f"{i:06d}.ply", _lidar_cloud(dpose, rng)
        )
    _write_poses(root / "color_poses.txt", color_poses)
    _write_poses(root / "depth_poses.txt", depth_poses)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("livo_scene")
    _make_dataset(root)

    cfg_dir = tmp_path_factory.mktemp("cfg")
    (cfg_dir / "run.yaml").write_text(
        f"""
dataset_type: 4
camera:
  fx: {FX}
  fy: {FY}
  cx: {CX}
  cy: {CY}
  width: {W}
  height: {H}
sdf_iter_step: 250
gs_iter_step: 100
leaf_sizes: 0.2
max_pt_num: 4000
gs_capacity: 8192
map:
  map_size: 8
ds_pt_num: 2000
batch_pt_num: 2048
n_levels: 4
log2_hashmap_size: 14
base_resolution: 8
per_level_scale: 1.6
hidden_dim: 32
geo_num_layer: 2
sh_degree: 0
refine_start_iter: 10
refine_every: 20
reset_alpha_every: 1000
export_interval: 999
tile_cap: 1024
sky_init: 0
mesh_init: 1
cull_mesh: 0
export_resolution: 0.1
export_mesh: 1
vis_frame_step: 1000
raymarch_max_hits: 4
raymarch_max_steps: 128
"""
    )
    out_root = tmp_path_factory.mktemp("out")
    cfg = load_config(cfg_dir / "run.yaml", root, make_run_dir=False)
    cfg.output_root = str(out_root)
    cfg.output_path = str(out_root / "run")
    cfg.model_path = str(out_root / "run" / "model")
    Path(cfg.model_path).mkdir(parents=True)

    from gssdf_tpu.train.pipeline import Pipeline

    pipe = Pipeline(cfg)
    pipe.batch_train()
    return Path(cfg.output_path), pipe


def test_lidar_pack_uses_depth_poses(run_dir):
    """The depth pack must come from the displaced LiDAR pose stream:
    reconstructed world points hug the wall plane."""
    out, pipe = run_dir
    pack = pipe.pack_dev
    pts = np.asarray(
        pack["origin"] + pack["direction"] * pack["depth"]
    )
    frac_wall = np.mean(np.abs(pts[:, 2] - WALL_Z) < 0.2)
    assert frac_wall > 0.9, frac_wall


def test_lidar_mesh_and_checkpoint(run_dir):
    out, pipe = run_dir
    assert (out / "model" / "sdf_checkpoint.npz").exists()
    meshes = list((out / "mesh").glob("*.ply"))
    assert meshes
    from gssdf_tpu.utils.ply import read_ply_xyz

    verts = read_ply_xyz(meshes[0])
    assert len(verts) > 50
    frac_near = np.mean(np.abs(verts[:, 2] - WALL_Z) < 0.3)
    assert frac_near > 0.6, frac_near


def test_lidar_renders_finite(run_dir):
    out, pipe = run_dir
    ev = out / "gs_log" / "render_eval.json"
    assert ev.exists()
    summary = list(json.load(open(ev)).values())[0]
    assert np.isfinite(summary["PSNR"]) and summary["PSNR"] > 8.0, summary
    assert 0.0 <= summary["SSIM"] <= 1.0
