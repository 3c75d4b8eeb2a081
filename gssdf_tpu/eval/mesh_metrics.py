"""Mesh vs GT point-cloud structure metrics (numpy/scipy; no open3d).

Reference analog: eval/structure_metrics/{evaluator.py:6-51,
eval_utils.py:25-136}: uniform-sample the predicted mesh (10M pts), voxel
downsample both clouds (1 cm), truncated NN distances both ways ->
MAE accuracy/completeness, Chamfer L1/L2, precision/recall/F-score at the
inlier threshold (2 cm default). The open3d ops are replaced by
triangle-area-weighted sampling, integer-voxel-hash downsampling, and a
scipy cKDTree.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from scipy.spatial import cKDTree


def sample_mesh_uniform(
    verts: np.ndarray, faces: np.ndarray, n_points: int, seed: int = 0
) -> np.ndarray:
    """Area-weighted uniform sampling on the surface
    (sample_points_uniformly analog)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total = area.sum()
    if total <= 0 or len(faces) == 0:
        return verts.copy()
    rng = np.random.RandomState(seed)
    tri = rng.choice(len(faces), n_points, p=area / total)
    r1 = np.sqrt(rng.rand(n_points, 1))
    r2 = rng.rand(n_points, 1)
    return (
        (1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri] + r1 * r2 * v2[tri]
    ).astype(np.float32)


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Mean of points per occupied voxel (voxel_down_sample analog)."""
    if voxel <= 0 or len(points) == 0:
        return points
    key = np.floor(points / voxel).astype(np.int64)
    # pack 3 ints into one key (21 bits each, offset to positive)
    k = (
        (key[:, 0] + (1 << 20)).astype(np.int64) << 42
    ) | ((key[:, 1] + (1 << 20)).astype(np.int64) << 21) | (
        key[:, 2] + (1 << 20)
    )
    order = np.argsort(k)
    k_sorted = k[order]
    p_sorted = points[order]
    starts = np.flatnonzero(np.concatenate([[True], k_sorted[1:] != k_sorted[:-1]]))
    sums = np.add.reduceat(p_sorted, starts, axis=0)
    counts = np.diff(np.concatenate([starts, [len(k)]]))
    return (sums / counts[:, None]).astype(np.float32)


def crop_to_bbox(points: np.ndarray, ref: np.ndarray, pad: float = 0.0):
    lo = ref.min(0) - pad
    hi = ref.max(0) + pad
    m = np.all((points >= lo) & (points <= hi), axis=-1)
    return points[m]


def eval_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    gt_points: np.ndarray,
    down_sample_res: float = 0.01,
    threshold: float = 0.02,
    truncation_acc: float = 0.2,
    truncation_com: float = 0.2,
    mesh_sample_point: int = 10_000_000,
    gt_bbx_mask_on: bool = True,
    seed: int = 0,
) -> Dict[str, float]:
    pred = sample_mesh_uniform(verts, faces, mesh_sample_point, seed)
    if gt_bbx_mask_on:
        pred = crop_to_bbox(pred, gt_points, pad=down_sample_res)
    pred = voxel_downsample(pred, down_sample_res)
    gt = voxel_downsample(np.asarray(gt_points, np.float32), down_sample_res)

    if len(pred) == 0 or len(gt) == 0:
        return {"error": float("nan")}

    # precision side: pred -> gt, outliers beyond truncation dropped
    d_p = cKDTree(gt).query(pred, k=1)[0]
    d_p = d_p[d_p < truncation_acc]
    # recall side: gt -> pred, outliers clamped (ignore_outlier=False)
    d_r = cKDTree(pred).query(gt, k=1)[0]
    d_r = np.minimum(d_r, truncation_com)

    dist_p_mean = float(np.mean(d_p)) if len(d_p) else float("nan")
    dist_r_mean = float(np.mean(d_r))
    chamfer_l1 = 0.5 * (dist_p_mean + dist_r_mean)
    chamfer_l2 = float(
        np.sqrt(0.5 * (np.mean(d_p ** 2) + np.mean(d_r ** 2)))
    )
    precision = float(np.mean(d_p < threshold)) * 100.0
    recall = float(np.mean(d_r < threshold)) * 100.0
    fscore = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return {
        "MAE_accuracy (cm)": dist_p_mean * 100.0,
        "MAE_completeness (cm)": dist_r_mean * 100.0,
        "Chamfer_L1 (cm)": chamfer_l1 * 100.0,
        "Chamfer_L2 (cm)": chamfer_l2 * 100.0,
        "Precision [Accuracy] (%)": precision,
        "Recall [Completeness] (%)": recall,
        "F-score (%)": fscore,
        "Spacing (cm)": down_sample_res * 100.0,
        "Inlier_threshold (cm)": threshold * 100.0,
        "Outlier_truncation_acc (cm)": truncation_acc * 100.0,
        "Outlier_truncation_com (cm)": truncation_com * 100.0,
    }


def eval_mesh_files(
    pred_mesh_path,
    gt_pcd_path,
    output_dir=None,
    **kwargs,
) -> Dict[str, float]:
    """File-level wrapper writing the reference's json outputs
    (evaluator.py:30-49)."""
    from ..utils.ply import read_ply, read_ply_xyz

    mesh = read_ply(pred_mesh_path)
    verts = np.stack(
        [mesh["vertex.x"], mesh["vertex.y"], mesh["vertex.z"]], -1
    )
    faces = mesh.get("face", np.zeros((0, 3), np.int32))
    gt = read_ply_xyz(gt_pcd_path)
    metrics = eval_mesh(verts, faces, gt, **kwargs)

    if output_dir is not None:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "structure_eval.json", "w") as f:
            json.dump({str(pred_mesh_path): metrics}, f, indent=True)
        with open(out / "evaluation_results.json", "a") as f:
            json.dump(str(pred_mesh_path), f)
            json.dump({k: round(v, 3) for k, v in metrics.items()}, f, indent=True)
            f.write("\n")
    return metrics
