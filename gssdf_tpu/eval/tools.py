"""Path/video/plot tooling.

Reference analog: eval/inter_poses.py (slerp pose interpolation),
eval/create_comparison_video.py (gt | render side-by-side mp4),
eval/draw_loss.py + draw_mem.py (column-log plots run by the misc thread,
neural_mapping.cpp:1760-1770).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np


def interpolate_poses(
    poses: np.ndarray, n_out: int, closed: bool = False
) -> np.ndarray:
    """Slerp rotations + lerp translations along the trajectory
    (inter_poses.py:28-60)."""
    from scipy.spatial.transform import Rotation, Slerp

    poses = np.asarray(poses, np.float64)
    if closed:
        poses = np.concatenate([poses, poses[:1]])
    n = len(poses)
    keys = np.arange(n, dtype=np.float64)
    rots = Rotation.from_matrix(poses[:, :3, :3])
    slerp = Slerp(keys, rots)
    ts = np.linspace(0.0, n - 1, n_out)
    r_out = slerp(ts).as_matrix()
    t_out = np.stack(
        [np.interp(ts, keys, poses[:, i, 3]) for i in range(3)], -1
    )
    out = np.tile(np.eye(4), (n_out, 1, 1))
    out[:, :3, :3] = r_out
    out[:, :3, 3] = t_out
    return out.astype(np.float32)


def write_video(frames_dir, out_path, fps: int = 30, pattern: str = "*.png"):
    """Directory of frames -> mp4 (render_path mp4 writer analog)."""
    import cv2

    files = sorted(Path(frames_dir).glob(pattern))
    if not files:
        raise FileNotFoundError(f"no {pattern} frames in {frames_dir}")
    first = cv2.imread(str(files[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(
        str(out_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for fp in files:
        vw.write(cv2.imread(str(fp)))
    vw.release()
    return out_path


def create_comparison_video(
    gt_dir, render_dir, out_path, fps: int = 30, label: bool = True
):
    """GT | render side-by-side video (create_comparison_video.py)."""
    import cv2

    gts = sorted(Path(gt_dir).glob("*.png"))
    renders = sorted(Path(render_dir).glob("*.png"))
    if not gts or len(gts) != len(renders):
        raise ValueError(
            f"frame mismatch: {len(gts)} gt vs {len(renders)} renders"
        )
    first = cv2.imread(str(gts[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(
        str(out_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (2 * w, h)
    )
    for g, r in zip(gts, renders):
        gi = cv2.imread(str(g))
        ri = cv2.imread(str(r))
        if label:
            cv2.putText(gi, "GT", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1,
                        (255, 255, 255), 2)
            cv2.putText(ri, "Render", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1,
                        (255, 255, 255), 2)
        vw.write(np.concatenate([gi, ri], axis=1))
    vw.release()
    return out_path


def plot_log(log_path, out_path: Optional[Path] = None,
             columns: Optional[List[str]] = None):
    """Plot llog column logs (draw_loss.py analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    log_path = Path(log_path)
    with open(log_path) as f:
        header = f.readline().split()
        rows = np.loadtxt(f, ndmin=2)
    if rows.size == 0:
        return None
    cols = columns or header
    n = len(cols)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), sharex=True)
    if n == 1:
        axes = [axes]
    for ax, name in zip(axes, cols):
        if name not in header:
            continue
        ax.plot(rows[:, header.index(name)])
        ax.set_ylabel(name)
        ax.grid(True, alpha=0.3)
    axes[-1].set_xlabel("log step")
    out = out_path or log_path.with_suffix(".png")
    fig.tight_layout()
    fig.savefig(out, dpi=100)
    plt.close(fig)
    return out


def depth_colormap(depth: np.ndarray, max_depth: Optional[float] = None):
    """TURBO-colormapped depth visualization (utils.cpp:250 analog)."""
    import cv2

    d = np.asarray(depth)
    if d.ndim == 3:
        d = d[..., 0]
    dmax = max_depth or max(float(d.max()), 1e-6)
    d8 = (np.clip(d / dmax, 0, 1) * 255).astype(np.uint8)
    return cv2.cvtColor(cv2.applyColorMap(d8, cv2.COLORMAP_TURBO),
                        cv2.COLOR_BGR2RGB)
