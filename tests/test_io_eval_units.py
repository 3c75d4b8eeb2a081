"""Direct unit tests for modules previously covered only via the e2e run:
gs PLY round-trip, image-eval harness, mesh culling, NeuralRGBD parser,
llog column logs."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from gssdf_tpu.gs.model import build_splat_model
from gssdf_tpu.gs.ply_io import export_gs_ply, import_gs_ply
from gssdf_tpu.utils.math import logit


def _model(n=20, capacity=32, sh_degree=1):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    anchors = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
    quats = jax.random.normal(k2, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return build_splat_model(
        key, anchors, jnp.full((n, 3), np.log(0.05)), quats,
        jnp.full((n,), logit(0.7)), sh_degree, capacity,
    )


def test_gs_ply_roundtrip(tmp_path):
    m = _model()
    path = tmp_path / "gs.ply"
    n = export_gs_ply(path, m)
    assert n == 20
    m2 = import_gs_ply(path, capacity=32)
    a = np.asarray(m.alive)
    np.testing.assert_allclose(
        np.asarray(m.anchors + m.params.offsets)[a],
        np.asarray(m2.anchors + m2.params.offsets)[np.asarray(m2.alive)],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m.params.opacity)[a],
        np.asarray(m2.params.opacity)[np.asarray(m2.alive)], atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m.params.features_rest)[a],
        np.asarray(m2.params.features_rest)[np.asarray(m2.alive)],
        atol=1e-6,
    )


def test_evaluate_dirs_known_psnr(tmp_path):
    from gssdf_tpu.eval.image_metrics import evaluate_dirs

    scene = tmp_path / "train"
    (scene / "renders").mkdir(parents=True)
    (scene / "gt").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        gt = rng.randint(0, 255, (32, 48, 3), np.uint8)
        cv2.imwrite(str(scene / "gt" / f"{i:05d}.png"), gt)
        cv2.imwrite(str(scene / "renders" / f"{i:05d}.png"), gt)
    out = evaluate_dirs(scene)
    assert out["PSNR"] > 60          # identical images
    assert out["SSIM"] > 0.999
    assert (tmp_path / "render_eval.json").exists()


def test_cull_mesh_by_depth():
    from gssdf_tpu.fields.meshing import cull_mesh_by_depth

    # two triangles at z=2 (seen) and z=10 (behind the measured depth)
    verts = np.array([
        [-0.1, -0.1, 2.0], [0.1, -0.1, 2.0], [0.0, 0.1, 2.0],
        [-0.1, -0.1, 10.0], [0.1, -0.1, 10.0], [0.0, 0.1, 10.0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    depth = np.full((48, 64, 1), 2.0, np.float32)
    keep = cull_mesh_by_depth(
        verts, faces, K, np.eye(4)[None], [depth], 64, 48
    )
    assert keep[:3].all()
    assert not keep[3:].any()


def test_neuralrgbd_parser(tmp_path):
    from gssdf_tpu.data.parsers.neuralrgbd import NeuralRGBDParser

    (tmp_path / "images").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "focal.txt").write_text("554.0\n")
    n = 3
    with open(tmp_path / "poses.txt", "w") as f:
        for i in range(n):
            pose = np.eye(4)
            pose[0, 3] = 0.1 * i
            for row in pose:
                f.write(" ".join(map(str, row)) + "\n")
            img = np.full((480, 640, 3), 40 * i, np.uint8)
            cv2.imwrite(str(tmp_path / "images" / f"img{i}.png"), img)
            cv2.imwrite(
                str(tmp_path / "depth" / f"depth{i}.png"),
                np.full((480, 640), 2000, np.uint16),
            )
    p = NeuralRGBDParser(tmp_path, ds_pt_num=500, llff=False)
    assert p.num_train == n
    assert p.camera.fx == 554.0
    img, pose = p.train_frame(1)
    assert img.shape == (480, 640, 3)
    # OpenGL -> OpenCV world/camera change flips y/z axes but keeps
    # translation x
    np.testing.assert_allclose(pose[0, 3], 0.1, atol=1e-6)
    pack = p.build_depth_pack()
    # depth scale 1/1000 and z-depth 2 m: after the OpenGL->OpenCV world
    # change, camera forward maps to world +y, so every ray ENDPOINT sits
    # on the plane y = 2
    np.testing.assert_allclose(np.asarray(pack.xyz)[:, 1], 2.0, atol=0.02)


def test_llog_columns(tmp_path):
    from gssdf_tpu.utils.llog import Llog

    log = Llog()
    path = tmp_path / "log.txt"
    log.record("loss", 1.0)
    log.record("psnr", 20.0)
    log.flash(path)
    log.record("loss", 0.5)
    log.record("extra_late", 7.0)   # must NOT widen the existing file
    log.flash(path)
    lines = path.read_text().splitlines()
    assert lines[0].split() == ["loss", "psnr"]
    assert len(lines) == 3
    assert all(len(l.split()) == 2 for l in lines[1:])
    t = log.timer("phase")
    t.tic(); t.toc_sum()
    assert "phase" in log.timing_summary()


def test_keyboard_commands_dispatch(monkeypatch):
    """Train-time keyboard commands queue and dispatch at boundaries;
    'q' requests a graceful stop."""
    from gssdf_tpu.config import Config
    from gssdf_tpu.train.pipeline import Pipeline

    pipe = Pipeline(Config(), with_data=False)
    assert not pipe._keys.active          # headless: watcher inert
    assert pipe._poll_keys() is False

    calls = []
    monkeypatch.setattr(pipe, "save_mesh", lambda res: calls.append(("m", res)))
    monkeypatch.setattr(pipe, "export_checkpoint", lambda: calls.append(("o",)))
    pipe._keys.active = True
    pipe._keys.q.put("m 0.25")
    pipe._keys.q.put("o")
    pipe._keys.q.put("q")
    assert pipe._poll_keys() is False
    assert pipe._poll_keys() is False
    assert pipe._poll_keys() is True      # 'q' -> stop
    assert calls == [("m", 0.25), ("o",)]


def test_llog_flash_resume_follows_file_header(tmp_path):
    """A fresh process appending to an existing log (resumed run) must
    follow the FILE's header, not its own recorded-value set — otherwise
    every appended row is column-shifted (code-review finding r03)."""
    from gssdf_tpu.utils.llog import Llog

    path = tmp_path / "gs_log.txt"
    a = Llog()
    a.record("x", 1.0)
    a.record("psnr", 20.0)
    a.flash(path, cols=("x", "psnr"))

    b = Llog()                  # new-process analog
    b.record("x", 2.0)          # 'psnr' not recorded yet at resume time
    b.flash(path, cols=("x", "psnr"))
    b.record("psnr", 21.0)
    b.record("x", 3.0)
    b.flash(path)

    lines = path.read_text().strip().splitlines()
    assert lines[0].split() == ["x", "psnr"]
    rows = [ln.split() for ln in lines[1:]]
    assert all(len(r) == 2 for r in rows), rows
    assert [float(r[0]) for r in rows] == [1.0, 2.0, 3.0]
    assert [float(r[1]) for r in rows] == [20.0, 0.0, 21.0]
