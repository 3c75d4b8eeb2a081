"""Spires parser, COLMAP export, video/pose/plot tools, prefilter."""

import struct
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gssdf_tpu.data.colmap_export import export_colmap
from gssdf_tpu.data.parsers.spires import SpiresParser
from gssdf_tpu.eval.tools import (
    create_comparison_video,
    depth_colormap,
    interpolate_poses,
    plot_log,
    write_video,
)
from gssdf_tpu.sensors.cameras import Camera
from gssdf_tpu.utils.render_spec import (
    load_render_camera_spec,
    resolve_render_camera,
)


def _write_pcd(path, pts):
    with open(path, "wb") as f:
        f.write(
            b"VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            b"COUNT 1 1 1\nWIDTH %d\nHEIGHT 1\nPOINTS %d\nDATA binary\n"
            % (len(pts), len(pts))
        )
        f.write(np.asarray(pts, "<f4").tobytes())


def _make_spires_raw(root: Path, n=4):
    (root / "images" / "cam0").mkdir(parents=True)
    (root / "lidar-clouds").mkdir()
    with open(root / "gt-tum.txt", "w") as f:
        for i in range(n):
            t = 100.0 + i
            f.write(f"{t} {0.1*i} 0 0 0 0 0 1\n")  # t x y z qx qy qz qw
    img = np.full((24, 32, 3), 100, np.uint8)
    for i in range(n):
        t = 100.0 + i + 0.001
        cv2.imwrite(str(root / "images" / "cam0" / f"{t:.6f}.jpg"), img)
        _write_pcd(
            root / "lidar-clouds" / f"{t:.6f}.pcd",
            np.array([[1.0, 0, 0], [0, 2.0, 0]], np.float32),
        )


def test_spires_parser_exports_then_reloads(tmp_path):
    _make_spires_raw(tmp_path)
    cam = Camera(fx=20, fy=20, cx=16, cy=12, width=32, height=24)
    T_I = np.eye(4)
    p = SpiresParser(tmp_path, cam, T_C_L=T_I, T_B_L=T_I, llff=False)
    assert (tmp_path / "color_poses.txt").exists()
    assert (tmp_path / "undistorted_images").is_dir()
    assert len(p.color_files) == 4
    # poses follow the TUM translations (identity extrinsics)
    np.testing.assert_allclose(p.color_poses[2][0, 3], 0.2, atol=1e-6)
    # second load path: reuses the export
    p2 = SpiresParser(tmp_path, cam, T_C_L=T_I, T_B_L=T_I, llff=False)
    assert len(p2.depth_files) == 4
    pack = p2.build_depth_pack()
    assert len(pack) == 8


def test_colmap_export_txt_and_bin(tmp_path):
    # reuse the exported-bag layout as the source dataset
    from gssdf_tpu.data.parsers.exported_bag import ExportedBagParser
    from gssdf_tpu.utils.ply import write_ply_xyz

    (tmp_path / "images").mkdir()
    (tmp_path / "depths").mkdir()
    n = 9
    with open(tmp_path / "color_poses.txt", "w") as fc, open(
        tmp_path / "depth_poses.txt", "w"
    ) as fd:
        for i in range(n):
            pose = np.eye(4)
            pose[0, 3] = 0.3 * i
            for row in pose:
                fc.write(" ".join(map(str, row)) + "\n")
                fd.write(" ".join(map(str, row)) + "\n")
            cv2.imwrite(
                str(tmp_path / "images" / f"{i}.png"),
                np.zeros((24, 32, 3), np.uint8),
            )
            write_ply_xyz(
                tmp_path / "depths" / f"{i}.ply",
                np.array([[0.0, 0.0, 2.0]], np.float32),
            )
    cam = Camera(fx=20, fy=20, cx=16, cy=12, width=32, height=24)
    parser = ExportedBagParser(tmp_path, cam, llff=False)

    out = export_colmap(parser, bin=False, llff=True)
    assert (out / "sparse/0/cameras.txt").exists()
    imgs_txt = (out / "sparse/0/images.txt").read_text()
    n_train = sum(
        1
        for ln in imgs_txt.splitlines()
        if ln.strip() and not ln.startswith("#")
    )
    # llff: frames 0 and 8 held out -> 7 train entries
    assert n_train == 7
    assert len(list((tmp_path / "test_colmap" / "images").iterdir())) == 2

    # bin round-trip: read cameras.bin header
    out2 = export_colmap(parser, out_root=tmp_path / "alt", bin=True)
    with open(out2 / "sparse/0/cameras.bin", "rb") as f:
        (count,) = struct.unpack("<Q", f.read(8))
        cam_id, model = struct.unpack("<ii", f.read(8))
        w, h = struct.unpack("<QQ", f.read(16))
    assert count == 1 and model == 1 and (w, h) == (32, 24)
    with open(out2 / "sparse/0/images.bin", "rb") as f:
        (icount,) = struct.unpack("<Q", f.read(8))
    assert icount == 9
    assert (out2 / "sparse/0/points3D.bin").exists()


def test_interpolate_poses_slerp():
    p0 = np.eye(4)
    p1 = np.eye(4)
    th = np.pi / 2
    p1[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    p1[0, 3] = 2.0
    out = interpolate_poses(np.stack([p0, p1]), 5)
    assert out.shape == (5, 4, 4)
    np.testing.assert_allclose(out[2][0, 3], 1.0, atol=1e-6)
    # midpoint rotation = 45 deg
    np.testing.assert_allclose(out[2][0, 0], np.cos(th / 2), atol=1e-6)
    # orthonormal
    R = out[3][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_videos_and_plot(tmp_path):
    d1 = tmp_path / "gt"; d2 = tmp_path / "renders"
    d1.mkdir(); d2.mkdir()
    for i in range(3):
        img = np.full((32, 48, 3), i * 40, np.uint8)
        cv2.imwrite(str(d1 / f"{i:03d}.png"), img)
        cv2.imwrite(str(d2 / f"{i:03d}.png"), img)
    v = write_video(d1, tmp_path / "a.mp4", fps=5)
    assert Path(v).stat().st_size > 0
    cv = create_comparison_video(d1, d2, tmp_path / "cmp.mp4", fps=5)
    assert Path(cv).stat().st_size > 0

    log = tmp_path / "gs_log.txt"
    log.write_text("loss psnr\n1.0 10\n0.5 20\n0.25 25\n")
    png = plot_log(log)
    assert png.exists()

    dm = depth_colormap(np.linspace(0, 5, 12).reshape(3, 4))
    assert dm.shape == (3, 4, 3) and dm.dtype == np.uint8


def test_render_camera_spec(tmp_path):
    p = tmp_path / "spec.txt"
    p.write_text("render_camera_spec_v1\n640 480 500 500 320 240\n")
    specs = load_render_camera_spec(p)
    assert specs[0].width == 640
    s = resolve_render_camera(specs, 5, 100)  # broadcast-1
    assert s.fx == 500
    bad = tmp_path / "spec2.txt"
    bad.write_text("wrong\n1 2 3 4 5 6\n")
    with pytest.raises(ValueError):
        load_render_camera_spec(bad)


def test_prefilter(tmp_path):
    """Pipeline.prefilter_data drops near-duplicate frames."""
    import jax
    from gssdf_tpu.config import Config, DatasetType
    from gssdf_tpu.train.pipeline import Pipeline

    results = tmp_path / "results"
    results.mkdir(parents=True)
    rng = np.random.RandomState(0)
    poses = []
    with open(tmp_path / "traj.txt", "w") as f:
        for i in range(6):
            pose = np.eye(4)
            f.write(" ".join(map(str, pose.reshape(-1))) + "\n")
    # frames 0-2 identical, 3-5 distinct noise
    base = np.full((680, 1200, 3), 128, np.uint8)
    depth = np.full((680, 1200), 2 * 6553.5, np.uint16)
    for i in range(6):
        img = base if i < 3 else rng.randint(0, 255, base.shape).astype(np.uint8)
        cv2.imwrite(str(results / f"frame{i:06d}.jpg"), img)
        cv2.imwrite(str(results / f"depth{i:06d}.png"), depth)

    cfg = Config()
    cfg.dataset_type = DatasetType.Replica
    cfg.dataset_path = str(tmp_path)
    cfg.prefilter = 25.0
    cfg.ds_pt_num = 100
    cfg.finalize_derived()
    pipe = Pipeline(cfg)
    pipe.prefilter_data()
    kept = pipe.loader.parser.train_ids
    # identical frames 1,2 dropped (PSNR inf >= threshold)
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert len(kept) >= 3


def test_lpips_jax_machinery(tmp_path, monkeypatch):
    """Full VGG16-LPIPS graph runs from a weights archive (random weights
    here — the metric's structure guarantees lpips(x, x) == 0 and
    lpips(x, y) > 0 regardless of weight values)."""
    import numpy as np

    rng = np.random.RandomState(0)
    w = {}
    chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for i in range(13):
        w[f"conv{i}_w"] = rng.randn(
            chans[i + 1], chans[i], 3, 3
        ).astype(np.float32) * 0.05
        w[f"conv{i}_b"] = np.zeros(chans[i + 1], np.float32)
    for i, c in enumerate([64, 128, 256, 512, 512]):
        w[f"lin{i}_w"] = np.abs(rng.randn(c)).astype(np.float32)
    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **w)

    from gssdf_tpu.eval import lpips_jax

    lpips_jax.load_weights.cache_clear()
    lpips_jax.get_lpips_fn.cache_clear()
    fn = lpips_jax.get_lpips_fn(str(path))
    assert fn is not None
    a = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    same = float(fn(a, a))
    diff = float(fn(a, b))
    assert abs(same) < 1e-6
    assert diff > 1e-4
    lpips_jax.load_weights.cache_clear()
    lpips_jax.get_lpips_fn.cache_clear()
