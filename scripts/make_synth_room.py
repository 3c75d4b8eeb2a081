"""Generate a synthetic Replica-format room dataset with analytic GT.

A closed textured box room rendered analytically (ray/box intersection —
no renderer dependency), written in the exact Replica layout the parser
expects (replica_parser.hpp:7-85 analog):

    <out>/<scene>/traj.txt                  16-col c2w poses (train)
    <out>/<scene>/results/frame%06d.jpg     color
    <out>/<scene>/results/depth%06d.png     z-depth * 6553.5, uint16
    <out>/<scene>/eval/{traj.txt,results/}  held-out split
    <out>/cull_replica_mesh/<scene>_culled.ply   GT surface points

Textures are functions of the world-space hit point, so images are exactly
multi-view consistent; depth is exact. This gives the validation runs
(RESULTS_r02.md) honest PSNR/chamfer targets at the real Replica operating
point (1200x680, f=600) without shipping the Replica dataset itself.

Usage: python scripts/make_synth_room.py <out_dir> [n_train] [n_eval]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

# room interior (meters); y is down (OpenCV camera convention at identity)
BOX_MIN = np.array([-4.0, -2.4, -3.0])
BOX_MAX = np.array([4.0, 2.4, 3.0])
W, H = 1200, 680
FX = FY = 600.0
CX, CY = 599.5, 339.5
DEPTH_SCALE = 6553.5

# face palette (rgb 0..1), indexed by (axis, is_max)
_PALETTE = {
    (0, 0): (0.85, 0.35, 0.25),
    (0, 1): (0.25, 0.55, 0.85),
    (1, 0): (0.9, 0.85, 0.75),   # ceiling (y = min — up)
    (1, 1): (0.45, 0.4, 0.35),   # floor
    (2, 0): (0.35, 0.75, 0.45),
    (2, 1): (0.8, 0.65, 0.3),
}


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def make_poses(n: int, seed: int, radius: float = 1.2):
    """Cameras near the room center sweeping yaw, varying pitch/position."""
    rng = np.random.RandomState(seed)
    poses = []
    for i in range(n):
        yaw = 2 * np.pi * i / n + 0.1 * rng.randn()
        pitch = 0.25 * np.sin(3.1 * i) + 0.05 * rng.randn()
        R = _rot_y(yaw) @ _rot_x(pitch)
        t = np.array([
            radius * np.sin(2 * np.pi * i / n),
            0.3 * np.sin(5.3 * i),
            radius * np.cos(2 * np.pi * i / n + 1.3),
        ]) + 0.05 * rng.randn(3)
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = t
        poses.append(pose)
    return poses


def texture(pts: np.ndarray, axis: np.ndarray, is_max: np.ndarray):
    """View-consistent color from the world hit point: per-face base color,
    0.5 m checker, and a smooth high-frequency weave."""
    base = np.empty(pts.shape[:-1] + (3,))
    for (a, m), c in _PALETTE.items():
        sel = (axis == a) & (is_max == m)
        base[sel] = c
    checker = (
        np.floor(pts[..., 0] * 2) + np.floor(pts[..., 1] * 2)
        + np.floor(pts[..., 2] * 2)
    ) % 2
    weave = 0.5 + 0.25 * np.sin(9.0 * pts[..., 0]) * np.cos(
        7.0 * pts[..., 2]
    ) + 0.25 * np.sin(11.0 * pts[..., 1])
    shade = (0.55 + 0.3 * checker)[..., None] * weave[..., None]
    rgb = np.clip(base * (0.35 + 0.65 * shade), 0.0, 1.0)
    return rgb


def render_frame(pose: np.ndarray):
    """Analytic interior ray/box render -> (rgb [H,W,3] f64, zdepth [H,W])."""
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                         indexing="ij")
    # pixel centers at u+0.5 with x=(u+0.5-cx)/fx — exactly the framework's
    # camera model (sensors/cameras.py image_coords pixel_offset=0.5)
    dcam = np.stack(
        [(xs - CX) / FX, (ys - CY) / FY, np.ones_like(xs)], -1
    )
    R, t = pose[:3, :3], pose[:3, 3]
    d = dcam @ R.T                                   # [H, W, 3] world dirs
    o = t[None, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_hi = (BOX_MAX - o) / d
        t_lo = (BOX_MIN - o) / d
    # exit t per axis; d == 0 never exits through that axis (a plain
    # where(d > 0, hi, lo) would pick (BOX_MIN-o)/0 = -inf at d == 0)
    t_ax = np.where(d > 0, t_hi, np.where(d < 0, t_lo, np.inf))
    axis = np.argmin(t_ax, axis=-1)
    t_hit = np.take_along_axis(t_ax, axis[..., None], -1)[..., 0]
    pts = o + d * t_hit[..., None]
    dsel = np.take_along_axis(d, axis[..., None], -1)[..., 0]
    rgb = texture(pts, axis, (dsel > 0).astype(np.int32))
    return rgb, t_hit                                # z-depth == t (dcam_z=1)


def write_split(split_dir: Path, poses, jpeg_q=95):
    import cv2

    results = split_dir / "results"
    results.mkdir(parents=True, exist_ok=True)
    with open(split_dir / "traj.txt", "w") as f:
        for pose in poses:
            f.write(" ".join(f"{v:.9g}" for v in pose.reshape(-1)) + "\n")
    for i, pose in enumerate(poses):
        rgb, z = render_frame(pose)
        bgr = (rgb[..., ::-1] * 255).astype(np.uint8)
        cv2.imwrite(str(results / f"frame{i:06d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, jpeg_q])
        cv2.imwrite(str(results / f"depth{i:06d}.png"),
                    np.clip(z * DEPTH_SCALE, 0, 65535).astype(np.uint16))


def gt_surface_points(n: int, seed: int = 0) -> np.ndarray:
    """Uniform area-weighted samples of the box interior surface."""
    rng = np.random.RandomState(seed)
    ext = BOX_MAX - BOX_MIN
    areas = np.array([
        ext[1] * ext[2], ext[1] * ext[2],
        ext[0] * ext[2], ext[0] * ext[2],
        ext[0] * ext[1], ext[0] * ext[1],
    ])
    counts = rng.multinomial(n, areas / areas.sum())
    pts = []
    for face, cnt in enumerate(counts):
        axis, is_max = face // 2, face % 2
        p = rng.uniform(BOX_MIN, BOX_MAX, (cnt, 3))
        p[:, axis] = BOX_MAX[axis] if is_max else BOX_MIN[axis]
        pts.append(p)
    return np.concatenate(pts)


def main(out_dir: Path, n_train: int = 48, n_eval: int = 8,
         scene: str = "room"):
    from gssdf_tpu.utils.ply import write_ply_xyz

    root = out_dir / scene
    write_split(root, make_poses(n_train, seed=0))
    write_split(root / "eval", make_poses(n_eval, seed=1, radius=0.9))
    mesh_dir = out_dir / "cull_replica_mesh"
    mesh_dir.mkdir(parents=True, exist_ok=True)
    write_ply_xyz(mesh_dir / f"{scene}_culled.ply", gt_surface_points(400000))
    print(f"dataset at {root} ({n_train} train / {n_eval} eval frames)")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/synth_room")
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    ne = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(out, nt, ne)
