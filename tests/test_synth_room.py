"""The synthetic room generator must agree with the framework's camera/ray
model: depth-ray endpoints land on the analytic box surface."""

import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import make_synth_room as msr  # noqa: E402


def test_room_dataset_geometry(tmp_path):
    msr.main(tmp_path, n_train=2, n_eval=1)
    from gssdf_tpu.data.parsers.replica import ReplicaParser

    p = ReplicaParser(tmp_path / "room", ds_pt_num=5000)
    assert len(p.color_files) == 2
    pack = p.build_depth_pack()
    xyz = pack.xyz
    dist = np.minimum(
        (xyz - msr.BOX_MIN).min(-1), (msr.BOX_MAX - xyz).min(-1)
    )
    # uint16 depth quantization bounds the error at ~0.2 mm
    assert np.abs(dist).max() < 2e-3, np.abs(dist).max()
    # GT surface points live exactly on the box
    gt = msr.gt_surface_points(1000)
    gdist = np.minimum(
        (gt - msr.BOX_MIN).min(-1), (msr.BOX_MAX - gt).min(-1)
    )
    assert np.abs(gdist).max() < 1e-9


def test_room_texture_view_consistent(tmp_path):
    """Two cameras looking at the same wall point must see the same color
    (texture is a function of the world hit point)."""
    poses = msr.make_poses(4, seed=3)
    rgb0, z0 = msr.render_frame(poses[0])
    # pick a pixel, find its world point, reproject into pose[1]
    v, u = 340, 600
    d = np.array([(u + 0.5 - msr.CX) / msr.FX,
                  (v + 0.5 - msr.CY) / msr.FY, 1.0])
    R, t = poses[0][:3, :3], poses[0][:3, 3]
    pt = t + (R @ d) * z0[v, u]
    R1, t1 = poses[1][:3, :3], poses[1][:3, 3]
    pc = R1.T @ (pt - t1)
    if pc[2] > 0.1:
        u1 = pc[0] / pc[2] * msr.FX + msr.CX - 0.5
        v1 = pc[1] / pc[2] * msr.FY + msr.CY - 0.5
        if 0 <= u1 < msr.W - 1 and 0 <= v1 < msr.H - 1:
            rgb1, z1 = msr.render_frame(poses[1])
            # only valid if the point is not occluded from pose 1
            if abs(z1[int(round(v1)), int(round(u1))] - pc[2]) < 0.05:
                c0 = rgb0[v, u]
                c1 = rgb1[int(round(v1)), int(round(u1))]
                assert np.abs(c0 - c1).max() < 0.15, (c0, c1)
