"""Config/flag system: cascaded YAML (run -> scene -> base) into one dataclass.

Reference analog: include/params/params.{h,cpp} (~120 ``k_*`` mutable globals
read through cascaded OpenCV-YAML files, params.cpp:115-441). Here the cascade
collapses into a single typed ``Config`` object that is explicit everywhere —
no global mutable state, which keeps jitted functions pure.

Both plain YAML and the reference's OpenCV FileStorage dialect
(``%YAML:1.0`` header, ``!!opencv-matrix`` nodes) are accepted, so configs
written for the reference load unchanged.
"""

from __future__ import annotations

import dataclasses
import math
import os
import re
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import numpy as np
import yaml


def _parse_opencv_yaml(text: str) -> dict:
    """Parse YAML accepting the OpenCV FileStorage dialect.

    Strips the ``%YAML:1.0`` directive and converts ``!!opencv-matrix``
    maps (rows/cols/dt/data) into nested python lists.
    """
    text = re.sub(r"^%YAML:[\d.]+\s*\n", "", text)
    text = text.replace("!!opencv-matrix", "")
    data = yaml.safe_load(text) or {}

    def conv(node: Any) -> Any:
        if isinstance(node, dict):
            if {"rows", "cols", "data"} <= set(node.keys()):
                arr = np.asarray(node["data"], dtype=np.float64)
                return arr.reshape(int(node["rows"]), int(node["cols"])).tolist()
            return {k: conv(v) for k, v in node.items()}
        if isinstance(node, list):
            return [conv(v) for v in node]
        return node

    return conv(data)


def load_yaml(path: os.PathLike) -> dict:
    with open(path) as f:
        return _parse_opencv_yaml(f.read())


# Dataset type enum, matching the reference dispatch values
# (data_loader.cpp:20-73).
class DatasetType:
    Replica = 0
    R3live = 1
    NeuralRGBD = 2
    Kitti = 3
    Fastlivo = 4
    Spires = 5
    Colmap = 6


@dataclass
class Config:
    # --- run / mode ---
    debug: bool = False
    seed: int = 0
    output_root: str = "output"
    output_path: str = ""         # resolved run dir
    model_path: str = ""          # <output_path>/model
    config_path: str = ""
    dataset_path: str = ""

    # --- dataset ---
    dataset_type: int = DatasetType.Replica
    preload: bool = False
    llff: bool = False            # every-8th-frame eval split
    cull_mesh: bool = False
    ds_pt_num: int = 10000        # per-frame downsampled lidar point budget
    max_pt_num: int = -1          # global cap on training points
    min_range: float = 0.01
    max_range: float = 100.0
    res_scale: float = 1.0
    prefilter: float = -1.0       # PSNR dedup threshold; <=0 disables
    max_time_diff_camera_and_pose: float = 0.0
    max_time_diff_lidar_and_pose: float = 0.0

    # --- map geometry ---
    map_size: float = 14.0        # config "inner" map size (m)
    leaf_size: float = 0.05
    fill_level: int = 1
    map_origin: tuple = (0.0, 0.0, 0.0)
    # derived (build_occ_map, neural_mapping.cpp:698-721)
    inner_map_size: float = 14.0
    octree_level: int = 0
    map_resolution: int = 0
    full_map_size: float = 0.0    # k_map_size = 2^level * leaf
    x_min: float = 0.0
    x_max: float = 0.0

    # --- hash encoding (config/base.yaml:8-10; encoding_map.cpp:15-23) ---
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 32
    per_level_scale: float = 2.0

    # --- decoder MLP (config/base.yaml:16-18) ---
    hidden_dim: int = 64
    geo_num_layer: int = 3
    geo_feat_dim: int = 14

    numerical_grad: bool = False

    # --- SDF training ---
    sdf_iter_step: int = 5000
    trunc_sdf: bool = True
    surface_sample_num: int = 3
    free_sample_num: int = 3
    batch_pt_num: int = 32768
    bce_sigma: float = 1e-2
    lr: float = 5e-3
    lr_end: float = 1e-4
    sdf_weight: float = 1.0
    eikonal_weight: float = 1e-1
    curvate_weight: float = 0.0
    align_weight: float = 0.1
    eikonal_sample_num: int = 8192
    outlier_removal_interval: int = 4000
    outlier_remove: bool = False
    outlier_dist: float = 0.05

    # --- GS training (config/base.yaml:36-60) ---
    gs_iter_step: int = 30000
    # mid-GS-phase resume snapshot cadence (iterations); 0 disables. No
    # reference analog — outage-proofing for long runs over a fragile
    # device tunnel: a dropped run resumes from model/gs_resume.npz with
    # `train --resume <run_dir>` instead of restarting the phase.
    resume_interval: int = 2000
    rgb_weight: float = 0.8
    dssim_weight: float = 0.2
    geo_init: bool = True
    color_init: bool = True
    sky_init: bool = True
    mesh_init: bool = True
    near: float = 0.05
    far: float = 300.0
    depth_type: int = 0            # 0 mean (expected) depth; 1 median
    render_normal_weight: float = 0.01
    isotropic_weight: float = 0.05
    gs_sdf_weight: float = 1e-3
    # static visible-first budget for the GS->SDF regularizer sample set
    # (0 = evaluate every splat sample; see GSTrainSpec.gs_sdf_budget)
    gs_sdf_budget: int = 65536
    detach_sdf_grad: bool = False
    refine_gs_struct_start_iter: int = 3000
    visible_thr: float = 1e-1
    center_reg: bool = False
    sh_degree: int = 0
    sh_degree_interval: int = 1000
    bck_color: int = 0
    tile_size: int = 16

    # --- densification strategy (config/base.yaml:63-79) ---
    prune_opa: float = 0.05
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.02
    refine_scale2d_stop_iter: int = 0
    # phase-2 window-honesty guard: keep a SPLIT-ONLY refine running
    # after refine_stop so splat screen size stays inside the train bbox
    # window budget (DIAGNOSIS_r04; documented divergence, default off)
    refine_scale2d_phase2: bool = False
    # renderer-aware densify gate: suppress grad-driven grow while the
    # train render's drop_frac exceeds this (0 = off; DIAGNOSIS_r04
    # addendum 2 — densification outgrowing the tile-cap budget is the
    # measured primary collapse mechanism at reference density)
    grow_drop_frac_max: float = 0.0
    # also gate the scale2d screen-size split (round-5 evidence: split
    # churn under a closed gate held drop_frac ~0.6; RESULTS_r05)
    gate_scale2d: bool = False
    refine_start_iter: int = 500
    refine_every: int = 100
    reset_alpha_every: int = 30
    pause_refine: bool = False
    # gsplat absgrad densify variant: densify statistics accumulate
    # per-tile-entry |screen grad| instead of the signed splat sum (the
    # TPU analog of gsplat's per-pixel absgrad; train/gs.py). The
    # reference defaults it off and advises against it for 2DGS — pair
    # with a higher grow_grad2d (~0.0008) when enabling
    # (config/base.yaml:74, neural_gaussian.cpp:215-217,629-630).
    use_absgrad: bool = False

    # --- visualization / export ---
    vis_frame_step: int = 10
    export_interval: int = 999
    export_colmap_format: int = 0
    export_train_pcl: bool = False
    export_mesh: bool = False
    test_idx: int = 3
    vis_attribute: int = 0
    vis_resolution: float = 0.04
    export_resolution: float = 0.01
    fps: int = 30
    vis_batch_pt_num: int = 0      # derived: 50 * batch_pt_num

    # --- camera / sensor (per-run yaml) ---
    camera: dict = field(default_factory=dict)
    T_C_L: Optional[list] = None   # camera-from-lidar extrinsic 4x4
    T_B_L: Optional[list] = None   # body-from-lidar extrinsic 4x4

    # --- TPU-native additions (no reference analog) ---
    mesh_shape: Optional[dict] = None   # e.g. {"data": 8}
    gs_capacity: int = 0                # 0 = auto bucket
    tile_cap: int = 512                 # max splats composited per tile
    # tile-cap capacity rung (DIAGNOSIS_r04 repair 2): > tile_cap enables
    # doubling the per-tile lists (one recompile) when the renderer-aware
    # grow gate stays closed for escalate_patience consecutive refines
    tile_cap_max: int = 0
    escalate_patience: int = 3
    tile_expand: int = 64               # per-splat tile-entry budget (big)
    tile_expand_small: int = 8          # small-bucket budget; 0 disables
    # eval/export renders use EXACT settings (the reference's lists are
    # unbounded; train-time caps/windows are a TPU static-shape adaptation
    # whose error training absorbs, but exported images must not carry it).
    # Chip-measured at 270k splats/1200x680: (2048, 256, 16) renders 70 dB
    # close to a fully-unbounded reference at 372 ms/frame, vs 29 dB for
    # the train settings (clamped windows on a few giant splats dominate).
    eval_tile_cap: int = 2048
    eval_tile_expand: int = 256
    eval_tile_expand_small: int = 16
    raymarch_max_hits: int = 8
    raymarch_max_steps: int = 512
    dtype_compute: str = "float32"

    # derived at runtime
    truncated_dis: float = 0.0
    sample_std: float = 0.0
    leaf_size_inv: float = 0.0
    bce_isigma: float = 0.0

    def finalize_derived(self) -> "Config":
        """Derived quantities (params.cpp:193-259,429)."""
        self.leaf_size_inv = 1.0 / self.leaf_size
        self.truncated_dis = 3.0 * self.leaf_size
        self.sample_std = self.bce_sigma
        self.bce_isigma = 1.0 / self.bce_sigma
        self.inner_map_size = self.map_size
        self.vis_batch_pt_num = 50 * self.batch_pt_num
        self.update_map_geometry(np.zeros(3), self.map_size)
        return self

    def update_map_geometry(self, origin: np.ndarray, inner_size: float) -> None:
        """Set map origin/extent from the point-cloud prior.

        Reference: build_occ_map, neural_mapping.cpp:698-721.
        """
        self.map_origin = tuple(float(v) for v in np.asarray(origin).reshape(3))
        self.inner_map_size = float(inner_size)
        self.x_max = 0.5 * self.inner_map_size
        self.x_min = -self.x_max
        self.octree_level = int(
            math.ceil(
                math.log2((self.inner_map_size + 2 * self.leaf_size) * self.leaf_size_inv)
            )
        )
        self.map_resolution = int(2 ** self.octree_level)
        self.full_map_size = self.map_resolution * self.leaf_size

    @property
    def reset_every(self) -> int:
        return self.reset_alpha_every * self.refine_every


_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(Config) if f.type in ("bool", bool)
}

# reference-yaml key -> Config field renames
_KEY_ALIASES = {
    "device_param": None,                # no device switch: jax picks backend
    "decoder_implementation": None,      # single decoder implementation
    "gs_sdf_reg": "gs_sdf_weight_enable",
}


def _apply(cfg: Config, data: dict) -> None:
    known = {f.name for f in dataclasses.fields(Config)}
    for key, val in data.items():
        if key in ("base_config", "scene_config"):
            continue
        if key == "map" and isinstance(val, dict):
            if "map_size" in val:
                cfg.map_size = float(val["map_size"])
            continue
        if key == "leaf_sizes":
            cfg.leaf_size = float(val)
            continue
        if key == "extrinsic" and isinstance(val, dict):
            # nested T_C_L / T_B_L matrices (config/fast_livo/campus.yaml:29-48)
            if "T_C_L" in val:
                cfg.T_C_L = val["T_C_L"]
            if "T_B_L" in val:
                cfg.T_B_L = val["T_B_L"]
            continue
        name = _KEY_ALIASES.get(key, key)
        if name is None:
            continue
        if name in known:
            if name in _BOOL_FIELDS:
                val = bool(int(val)) if isinstance(val, str) else bool(val)
            else:
                # yaml 1.1 leaves "1e-3" (no dot) as a string; coerce to the
                # declared field type like OpenCV FileStorage would
                cur = getattr(cfg, name)
                if isinstance(cur, float) and not isinstance(val, float):
                    val = float(val)
                elif isinstance(cur, int) and not isinstance(cur, bool) and isinstance(val, (str, float)):
                    val = int(float(val))
            setattr(cfg, name, val)
        # unknown keys are kept in camera dict only if camera-like; else ignored


def load_config(
    run_config: os.PathLike,
    data_path: Optional[os.PathLike] = None,
    make_run_dir: bool = False,
) -> Config:
    """Load the cascaded config: run yaml -> scene_config -> base_config.

    Matches the reference cascade semantics (params.cpp:176-188): the base
    config is applied first, then the scene config, then the run config, so
    more specific files override the general ones.
    """
    run_config = Path(run_config)
    chain = []
    seen = set()
    p: Optional[Path] = run_config
    while p is not None:
        p = p.resolve()
        if p in seen:
            raise ValueError(f"config cycle at {p}")
        seen.add(p)
        data = load_yaml(p)
        chain.append((p, data))
        nxt = data.get("scene_config") or data.get("base_config")
        p = (p.parent / nxt).resolve() if nxt else None

    cfg = Config()
    for _, data in reversed(chain):  # base first, run last
        _apply(cfg, data)

    cfg.config_path = str(run_config)
    if data_path is not None:
        cfg.dataset_path = str(data_path)

    cfg.finalize_derived()

    if make_run_dir:
        stamp = time.strftime("%Y%m%d_%H%M%S")
        tag = Path(cfg.dataset_path).name or "run"
        run_dir = Path(cfg.output_root) / f"{stamp}_{tag}_{run_config.stem}"
        run_dir.mkdir(parents=True, exist_ok=True)
        (run_dir / "model").mkdir(exist_ok=True)
        latest = Path(cfg.output_root) / "latest_run"
        try:
            if latest.is_symlink() or latest.exists():
                latest.unlink()
            latest.symlink_to(run_dir.resolve())
        except OSError:
            pass
        cfg.output_path = str(run_dir)
        cfg.model_path = str(run_dir / "model")
        # self-describing run dir: copy the resolved config
        import shutil

        cfg_dir = run_dir / "model" / "config"
        cfg_dir.mkdir(parents=True, exist_ok=True)
        for src, _ in chain:
            shutil.copy(src, cfg_dir / src.name)
        # append dataset_path so view/render modes can reload the data
        # (params.cpp:144-155 appends data_path the same way)
        with open(cfg_dir / Path(cfg.config_path).name, "a") as f:
            f.write(f"\ndataset_path: {cfg.dataset_path}\n")
    return cfg


def save_pt_params(cfg: Config, path: os.PathLike) -> None:
    """Persist map geometry for checkpoint reload (params.cpp:443-453)."""
    with open(path, "w") as f:
        yaml.safe_dump(
            {
                "map_origin": list(cfg.map_origin),
                "inner_map_size": cfg.inner_map_size,
                "leaf_size": cfg.leaf_size,
                "dataset_path": cfg.dataset_path,
            },
            f,
        )


def load_pt_params(cfg: Config, path: os.PathLike) -> Config:
    data = load_yaml(path)
    cfg.leaf_size = float(data.get("leaf_size", cfg.leaf_size))
    cfg.finalize_derived()
    cfg.update_map_geometry(
        np.asarray(data["map_origin"], dtype=np.float32),
        float(data["inner_map_size"]),
    )
    if "dataset_path" in data and not cfg.dataset_path:
        cfg.dataset_path = data["dataset_path"]
    return cfg
