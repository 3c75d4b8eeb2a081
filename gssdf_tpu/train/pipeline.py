"""Training orchestrator: data -> occupancy prior -> SDF phase -> joint GS
phase -> mesh/render/eval exports.

Reference analog: ``NeuralSLAM`` (include/neural_mapping/neural_mapping.{h,
cpp}): batch_train (:814-875), build_occ_map (:683-812), nsdf_train
(:294-354), gs_train (:356-531), render_image (:879-908), save_mesh
(:1380-1402), export/load_checkpoint (:1331-1378), end (:1686-1758).

Host-side schedule around fully-jitted steps; every array that matters lives
on device, host work is logging + refine triggers.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, save_pt_params
from ..data.loader import DataLoader
from ..fields.meshing import (
    apply_vertex_mask,
    cull_mesh_by_depth,
    extract_mesh,
)
from ..fields.occupancy import (
    OccupancyGrid,
    build_occupancy_grid,
    occupied_voxel_centers,
)
from ..fields.sdf_field import (
    MapGeometry,
    SDFFieldSpec,
    init_sdf_field,
)
from ..gs.model import (
    bucket_capacity,
    build_splat_model,
    init_quats_opacity_with_sdf,
    init_scales_from_knn,
    sky_sphere_splats,
)
from ..gs.ply_io import export_gs_ply, import_gs_ply
from ..gs.render import RenderSettings, render_splats
from ..losses import psnr as psnr_fn
from ..utils.llog import LLOG
from ..utils.progress import ProgressBar
from ..utils.math import logit, random_quat
from ..utils.ply import write_ply, write_ply_xyz
from .gs import (
    GSState,
    GSTrainSpec,
    GSTrainer,
    RefineSpec,
    gs_state_init,
    sdf_lr_at,
    splat_model,
    xyz_lr_at,
)
from .optim import adam_init
from .sdf import (
    SDFTrainSpec,
    make_sdf_train_step,
    outlier_inlier_mask,
    pick_ray_batch,
)


class Pipeline:
    def __init__(self, cfg: Config, with_data: bool = True):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(cfg.seed)
        self.loader = DataLoader(cfg) if with_data else None
        if cfg.export_colmap_format and self.loader is not None:
            # k_export_colmap_format 1=txt colmap, 2=nerfstudio, 3=binary
            # colmap (NeuralSLAM ctor, neural_mapping.cpp:39-45)
            from ..data.colmap_export import export_colmap

            f = int(cfg.export_colmap_format)
            export_colmap(
                self.loader.parser, bin=f == 3, nerfstudio=f == 2
            )
        # multi-chip mesh (cfg.mesh_shape, e.g. {"data": 8}; "data": 0 =
        # all local devices). Parameters replicate; rays/cameras shard.
        self.mesh = None
        if cfg.mesh_shape:
            want = int(cfg.mesh_shape.get("data", 0))
            n = (
                min(want, len(jax.devices())) if want > 0
                else len(jax.devices())
            )
            if n > 1:
                # hybrid DCN x ICI device order (parallel/mesh.py): mesh
                # neighbors are ICI neighbors, so all-reduces reduce
                # within hosts before crossing DCN
                from ..parallel.mesh import make_mesh

                self.mesh = make_mesh(None if want <= 0 else n)
                print(
                    f"mesh: data-parallel over {self.mesh.devices.size} "
                    "devices"
                )
        self.geom: Optional[MapGeometry] = None
        self.grid: Optional[OccupancyGrid] = None
        self.field_spec = SDFFieldSpec.from_config(cfg)
        self.sdf_params = None
        self.sdf_opt = None
        self.gs_state: Optional[GSState] = None
        self.gs_trainer: Optional[GSTrainer] = None
        self.sample_std = cfg.sample_std
        self.pack_dev = None           # device-resident ray pack dict
        self.spatial_scale = 1.0
        self._keys = _KeyWatcher()
        self._stop = False             # 'q' keyboard command
        self._render_scale = 1.0       # 'd'/'s' keyboard commands
        self._render_jit = jax.jit(
            render_splats, static_argnames=("settings", "training", "center_reg")
        )

    # -- setup -------------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def prefilter_data(self):
        """PSNR-dedup of near-identical consecutive frames: frame kept only
        when PSNR vs the last kept frame is below the threshold
        (prefilter_data, neural_mapping.cpp:595-669)."""
        cfg = self.cfg
        parser = self.loader.parser
        ids = parser.train_ids
        if len(ids) < 2:
            return
        kept = [ids[0]]
        prev = jnp.asarray(parser.get_color_image(ids[0]))
        for i in ids[1:]:
            now = jnp.asarray(parser.get_color_image(i))
            if float(psnr_fn(prev, now)) < cfg.prefilter:
                kept.append(i)
                prev = now
        print(f"Prefilter: {len(ids)} -> {len(kept)} frames")
        parser.train_ids = kept

    def build_occ_map(self):
        """Point-cloud prior -> map geometry + occupancy grid
        (build_occ_map, neural_mapping.cpp:683-812)."""
        cfg = self.cfg
        pack = self.loader.depth_pack()
        xyz = pack.xyz
        center = xyz.mean(0)
        radius = float(np.max(np.linalg.norm(xyz - center, axis=-1)))
        inner = cfg.map_size
        if inner < radius * 2.0:
            print(
                f"Warning: configured map size {inner} < pcl diameter "
                f"{radius * 2.0:.2f}; keeping configured size"
            )
        else:
            inner = radius * 2.0
        cfg.update_map_geometry(center, inner)
        self.geom = MapGeometry(
            origin=tuple(float(v) for v in center),
            map_size=cfg.full_map_size,
        )
        self.spatial_scale = min(0.5 * cfg.inner_map_size, 2.0)

        half = 0.5 * cfg.inner_map_size
        inrange = np.all(np.abs(xyz - center) < half - 1e-6, axis=-1)
        self.grid = build_occupancy_grid(
            xyz[inrange], self.geom, cfg.map_resolution, dilate=True
        )

        if cfg.model_path:
            write_ply_xyz(
                Path(cfg.model_path) / "as_occ_prior.ply",
                occupied_voxel_centers(self.grid),
            )
        if cfg.export_train_pcl and cfg.output_path:
            # k_export_train_pcl (build_occ_map, neural_mapping.cpp:803-808)
            write_ply_xyz(Path(cfg.output_path) / "train_points.ply", xyz)
        # device-resident flattened ray pack
        self.pack_dev = {
            "origin": jnp.asarray(pack.origin),
            "direction": jnp.asarray(pack.direction),
            "depth": jnp.asarray(pack.depth),
        }
        # surviving-ray indices into the ORIGINAL pack (outlier removal
        # composes onto this); saved in the GS resume snapshot so a resumed
        # run reconstructs the exact post-removal pack
        self.pack_idx = np.arange(pack.origin.shape[0], dtype=np.int64)
        self.sdf_params = init_sdf_field(self._next_key(), self.field_spec)
        self.sdf_opt = adam_init(self.sdf_params)

    def _sdf_spec(self) -> SDFTrainSpec:
        spec = SDFTrainSpec.from_config(self.cfg, self.field_spec)
        if self.mesh is not None:
            import dataclasses

            n = int(self.mesh.devices.size)
            spec = dataclasses.replace(
                spec,
                batch_rays=-(-spec.batch_rays // n) * n,
                point_budget=(
                    -(-spec.point_budget // n) * n if spec.point_budget else 0
                ),
            )
        return spec

    # -- SDF phase ---------------------------------------------------------

    def nsdf_train(self, iters: Optional[int] = None, log_every: int = 10):
        """Pure-SDF phase (nsdf_train, neural_mapping.cpp:294-354):
        linear lr decay, adaptive sample_std from E[1/isigma], periodic
        outlier removal."""
        cfg = self.cfg
        iters = iters if iters is not None else cfg.sdf_iter_step
        spec = self._sdf_spec()
        if self.mesh is not None:
            from ..parallel.train import make_sharded_sdf_train_step

            step = make_sharded_sdf_train_step(
                spec, self.geom, self.grid, self.mesh
            )
        else:
            step = make_sdf_train_step(spec, self.geom, self.grid)
        t_iter = LLOG.timer("sdf_iter")
        log_path = (
            Path(cfg.output_path) / "nsdf_log.txt" if cfg.output_path else None
        )

        for i in ProgressBar(range(iters), prefix="SDF"):
            t_iter.tic()
            lr = cfg.lr * (1 - i / iters) + cfg.lr_end * (i / iters)
            k1, k2 = jax.random.split(self._next_key())
            rays = pick_ray_batch(self.pack_dev, k1, spec.batch_rays)
            self.sdf_params, self.sdf_opt, aux = step(
                self.sdf_params, self.sdf_opt, *rays, k2,
                self.sample_std, lr,
            )
            t_iter.toc_sum()

            if i % log_every == 0 or i == iters - 1:
                isig = float(aux["isigma_mean"])
                # sdf_train_callback (neural_mapping.cpp:541-548)
                self.sample_std = max(1.0 / max(isig, 1e-6), cfg.bce_sigma)
                LLOG.record("loss", float(aux["loss"]))
                LLOG.record("sdf", float(aux["sdf"]))
                if "eik" in aux:
                    LLOG.record("eik", float(aux["eik"]))
                LLOG.record("sstd", self.sample_std)
                LLOG.record("lr", lr)
                if log_path:
                    LLOG.flash(log_path)
                    if i > 0 and i % 1000 == 0:
                        _plot_async(log_path)
                if self._poll_keys():
                    break

            if (
                cfg.outlier_remove
                and i > 0
                and i % cfg.outlier_removal_interval == 0
            ):
                self._remove_outliers(i / iters)

    def _remove_outliers(self, ratio: float):
        """|sdf| outlier removal over the train pack
        (sdf_train_callback, neural_mapping.cpp:559-589)."""
        cfg = self.cfg
        thresh = float(
            np.exp(
                np.log(cfg.truncated_dis) * (1 - ratio)
                + np.log(cfg.outlier_dist) * ratio
            )
        )
        xyz = (
            self.pack_dev["origin"]
            + self.pack_dev["direction"] * self.pack_dev["depth"]
        )
        mask = outlier_inlier_mask(
            self.sdf_params, self.geom, self.field_spec, xyz, thresh
        )
        n0 = int(mask.shape[0])
        idx = jnp.nonzero(mask)[0]
        if int(idx.shape[0]) < max(1, n0 // 100):
            # a barely-trained SDF can classify (nearly) everything as
            # outlier; wiping the ray pack would crash every later batch
            # pick — keep the pack and let a later (better-trained) pass
            # do the removal
            print(
                f"Outlier removal({thresh:.3f}): would keep only "
                f"{int(idx.shape[0])}/{n0} rays — skipped"
            )
            return
        self.pack_dev = {k: v[idx] for k, v in self.pack_dev.items()}
        self.pack_idx = self.pack_idx[np.asarray(idx)]
        print(f"Outlier removal({thresh:.3f}): {n0} -> {int(idx.shape[0])}")

    # -- GS phase ----------------------------------------------------------

    def init_gs(self):
        """SDF-initialized splat model (NeuralGS ctor,
        neural_gaussian.cpp:273-454)."""
        cfg = self.cfg
        mesh_res = 0.5 * cfg.leaf_size
        sdf_on = cfg.sdf_weight > 0

        verts = np.zeros((0, 3), np.float32)
        if cfg.mesh_init and sdf_on:
            verts, faces, _ = extract_mesh(
                self.sdf_params, self.geom, self.field_spec, self.grid,
                mesh_res, with_colors=False,
            )
            if len(verts) > cfg.vis_batch_pt_num:
                step = max(len(verts) // cfg.vis_batch_pt_num, 1)
                verts = verts[::step]
        if len(verts) > 0:
            anchors = jnp.asarray(verts)
            scales = jnp.full((len(verts), 3), np.log(mesh_res), jnp.float32)
        else:
            if cfg.mesh_init and sdf_on:
                print("mesh_init produced no vertices; falling back to points")
            xyz = np.asarray(
                self.pack_dev["origin"]
                + self.pack_dev["direction"] * self.pack_dev["depth"]
            )
            step = max(int(len(xyz) / 1e6), 1)
            anchors = jnp.asarray(xyz[::step])
            scales = init_scales_from_knn(anchors)

        n = anchors.shape[0]
        if sdf_on and cfg.geo_init:
            quats, opa = init_quats_opacity_with_sdf(
                self.sdf_params, self.geom, self.field_spec, anchors, mesh_res
            )
            opa_logit = logit(jnp.clip(opa, 1e-4, 1 - 1e-4))
        else:
            quats = random_quat(self._next_key(), n)
            opa_logit = jnp.full((n,), float(logit(0.1)), jnp.float32)

        parts = [
            {
                "anchors": anchors,
                "scales_log": scales,
                "quats": quats,
                "opacity_logit": opa_logit,
            }
        ]
        if cfg.sky_init:
            sky = sky_sphere_splats(
                self._next_key(),
                np.asarray(self.geom.origin),
                cfg.inner_map_size,
                0.5 * cfg.inner_map_size,
            )
            # sky radius defines far plane (neural_gaussian.cpp:347-349)
            cfg.far = 2.0 * 0.6 * cfg.inner_map_size
            parts.append(sky)

        cat = {
            k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]
        }
        total = cat["anchors"].shape[0]
        capacity = self.cfg.gs_capacity or bucket_capacity(total)
        if total > (capacity * 3) // 4:
            # explicit capacity is a hard cap: subsample the init set to 3/4
            # so densification has headroom (no reference analog — the CUDA
            # store grows unboundedly)
            keep = (capacity * 3) // 4
            sel = np.sort(
                np.random.RandomState(self.cfg.seed).choice(
                    total, keep, replace=False
                )
            )
            cat = {k: v[sel] for k, v in cat.items()}
            print(f"GS init: subsampled {total} -> {keep} (capacity {capacity})")
            total = keep
        model = build_splat_model(
            self._next_key(),
            cat["anchors"],
            cat["scales_log"],
            cat["quats"],
            cat["opacity_logit"],
            cfg.sh_degree,
            capacity,
        )
        self.gs_state = gs_state_init(self.sdf_params, model)
        print(f"GS init: {total} splats (capacity {capacity})")

    def _gs_spec(self) -> GSTrainSpec:
        cfg = self.cfg
        cam = self.loader.camera
        return GSTrainSpec(
            sdf=self._sdf_spec(),
            render=RenderSettings(
                width=cam.width,
                height=cam.height,
                near=cfg.near,
                far=cfg.far,
                sh_degree=cfg.sh_degree,
                tile_size=cfg.tile_size,
                tile_cap=cfg.tile_cap,
                tile_expand=cfg.tile_expand,
                tile_expand_small=cfg.tile_expand_small,
                bck_color=cfg.bck_color,
            ),
            refine=RefineSpec(
                grow_grad2d=cfg.grow_grad2d,
                grow_scale3d=cfg.grow_scale3d,
                grow_scale2d=cfg.grow_scale2d,
                prune_opa=cfg.prune_opa,
                prune_scale3d=cfg.prune_scale3d,
                refine_scale2d_stop_iter=cfg.refine_scale2d_stop_iter,
                spatial_scale=self.spatial_scale,
                original_spatial_scale=0.5 * cfg.inner_map_size,
                grow_drop_frac_max=cfg.grow_drop_frac_max,
                gate_scale2d=cfg.gate_scale2d,
            ),
            rgb_weight=cfg.rgb_weight,
            dssim_weight=cfg.dssim_weight,
            render_normal_weight=cfg.render_normal_weight,
            isotropic_weight=cfg.isotropic_weight,
            gs_sdf_weight=cfg.gs_sdf_weight,
            gs_sdf_budget=cfg.gs_sdf_budget,
            visible_thr=cfg.visible_thr,
            center_reg=cfg.center_reg,
            detach_sdf_grad=cfg.detach_sdf_grad,
            gs_sdf_reg=cfg.sdf_weight > 0,
            depth_type=cfg.depth_type,
            sh_degree=cfg.sh_degree,
            sh_degree_interval=cfg.sh_degree_interval,
            refine_gs_struct_start_iter=cfg.refine_gs_struct_start_iter,
            refine_start_iter=cfg.refine_start_iter,
            refine_every=cfg.refine_every,
            reset_every=cfg.reset_every,
            refine_scale2d_stop_iter=cfg.refine_scale2d_stop_iter,
            refine_scale2d_phase2=cfg.refine_scale2d_phase2,
            tile_cap_max=cfg.tile_cap_max,
            escalate_patience=cfg.escalate_patience,
            pause_refine_after_reset=(
                self.loader.num_train if cfg.pause_refine else 0
            ),
            num_train_data=self.loader.num_train,
            # an explicit gs_capacity is a hard cap (tests/smoke budgets);
            # auto-bucketed stores grow by re-bucketing at 90% saturation
            rebucket_sat=0.0 if cfg.gs_capacity else 0.9,
            gs_iter_step=cfg.gs_iter_step,
            lr=cfg.lr,
            lr_end=cfg.lr_end,
            use_absgrad=cfg.use_absgrad,
        )

    def gs_train(self, iters: Optional[int] = None, log_every: int = 10,
                 start_iter: int = 0):
        """Joint phase (gs_train, neural_mapping.cpp:356-531).

        On a mesh, each device step renders one camera per chip (B images
        advance the reference's per-image iteration counter by B); the host
        feeds stacked frame batches through a prefetching fetcher so decode
        stays off the device critical path (the reference preloads the full
        color stack instead, base_parser.cpp:843-857 — ``preload: true``
        reproduces that too).

        ``start_iter`` > 0 continues an interrupted phase (load_gs_resume):
        the deterministic frame schedule is sliced, color-init is skipped,
        and all iteration-indexed schedules (lr, sh, refine) pick up where
        they left off.
        """
        cfg = self.cfg
        iters = iters if iters is not None else cfg.gs_iter_step
        spec = self._gs_spec()
        self.gs_trainer = GSTrainer(
            spec, self.geom, self.grid, self.loader.camera, mesh=self.mesh
        )
        # eval/export renders trace at store capacity too: register so
        # rebucket/shrink drops their stale-shape executables as well
        self.gs_trainer.capacity_jits.append(self._render_jit)
        trainer = self.gs_trainer
        b = trainer.batch
        n_train = self.loader.num_train
        log_path = (
            Path(cfg.output_path) / "gs_log.txt" if cfg.output_path else None
        )
        t_iter = LLOG.timer("gs_iter")
        mask = self._train_mask()

        def run_step(gt_b, pose_b, sdf_lr, xyz_lr, sh, opt_struct,
                     color_only):
            k1, k2 = jax.random.split(self._next_key())
            rays = pick_ray_batch(self.pack_dev, k1, spec.sdf.batch_rays)
            if b == 1:
                return trainer.step_fn(
                    self.gs_state, jnp.asarray(gt_b[0]),
                    jnp.asarray(pose_b[0]), *rays, k2, self.sample_std,
                    sdf_lr, xyz_lr, sh, opt_struct, color_only, mask,
                )
            return trainer.step_fn(
                self.gs_state, jnp.asarray(gt_b), jnp.asarray(pose_b),
                *rays, k2, self.sample_std, sdf_lr, xyz_lr, sh, opt_struct,
                color_only, mask,
            )

        # decode the color stack ONCE; both fetchers (color-init epoch +
        # main loop) share it (the reference's load_colors preload,
        # base_parser.cpp:843-857)
        pre = (
            _FrameFetcher.preload_stack(self.loader) if cfg.preload else None
        )

        # color-init pre-pass: one epoch, structure frozen, feature lrs x10
        # (gs_train, neural_mapping.cpp:369-387)
        if cfg.color_init and start_iter == 0:
            order = _frame_order(cfg.seed, n_train, n_train, b)
            fetch = _FrameFetcher(self.loader, order, b, cfg.preload,
                                  to_device=self.mesh is None, pre=pre)
            for gt_b, pose_b in fetch:
                self.gs_state, _aux = run_step(
                    gt_b, pose_b, 0.0, 0.0, 0, False, True
                )
            self.sdf_params = self.gs_state.params["sdf"]
            print(f"color init: {n_train} iterations")

        order = _frame_order(cfg.seed, n_train, iters, b)[start_iter:]
        fetch = _FrameFetcher(self.loader, order, b, cfg.preload,
                              to_device=self.mesh is None, pre=pre)

        # gs_log.txt column scope: joint-phase metrics only (stale SDF-phase
        # columns must not be re-flashed); keys absent at first flash (off
        # features) are dropped by Llog.flash's cols filter
        gs_cols = (
            "gs_loss", "color", "dssim", "sdf_nn_loss", "gs_eik", "sstd",
            "gs_sdf", "drop_frac", "drop_vis", "chunk_active", "clamp_frac",
            "gs_sdf_ovf",
            "gs_num",
            "psnr", "host_rss_gb", "device_gb", "device_peak_gb",
        )
        from ..utils.llog import memory_stats

        for k, v in memory_stats().items():
            LLOG.record(k, v)

        for i, (gt_b, pose_b) in ProgressBar(
            zip(range(start_iter, iters, b), fetch),
            prefix="GS",
            total=len(range(start_iter, iters, b)),
        ):
            t_iter.tic()
            xyz_lr = xyz_lr_at(spec, i)
            sdf_lr = sdf_lr_at(spec, xyz_lr)
            opt_struct = i > cfg.refine_gs_struct_start_iter
            self.gs_state, aux = run_step(
                gt_b, pose_b, sdf_lr, xyz_lr, trainer.sh_active(i),
                opt_struct, False,
            )
            # keep the standalone sdf params view in sync
            self.sdf_params = self.gs_state.params["sdf"]
            self.gs_state, rinfo = trainer.callback(
                self.gs_state, i, self._next_key(), stride=b,
                drop_frac_fn=(
                    (lambda a=aux: float(a["drop_frac"]))
                    if "drop_frac" in aux else None
                ),
            )
            t_iter.toc_sum()
            if rinfo and log_path:
                # structural events (grow/prune counts, grow_gated,
                # rebucket/shrink, tile_cap rung) are intermittent — a
                # dedicated event log, not gs_log columns, so the round-4
                # style collapse forensics can replay the refine schedule
                with open(log_path.parent / "refine_log.txt", "a") as f:
                    f.write(json.dumps({"iter": i, **rinfo}) + "\n")

            log_now = _fires(i, b, log_every) or i + b >= iters
            if "isigma_mean" in aux and log_now:
                self.sample_std = max(
                    1.0 / max(float(aux["isigma_mean"]), 1e-6), cfg.bce_sigma
                )
            if cfg.export_interval > 0 and _fires(i, b, cfg.export_interval):
                p = self.export_test_image(cfg.test_idx, prefix=f"{i}_")
                if p is not None:
                    LLOG.record("psnr", p)

            if log_now or rinfo:
                LLOG.record("gs_loss", float(aux["gs_loss"]))
                LLOG.record("color", float(aux["color"]))
                LLOG.record("dssim", float(aux["dssim"]))
                if "sdf_nn" in aux:
                    LLOG.record("sdf_nn_loss", float(aux["sdf_nn"]))
                # joint-phase SDF observability: record the LIVE eikonal from
                # this step's aux instead of re-flashing the stale SDF-phase
                # `eik` column (which froze at the last SDF-phase value)
                if "gs_eik" in aux:
                    LLOG.record("gs_eik", float(aux["gs_eik"]))
                LLOG.record("sstd", self.sample_std)
                if "gs_sdf" in aux:
                    LLOG.record("gs_sdf", float(aux["gs_sdf"]))
                if "drop_frac" in aux:
                    LLOG.record("drop_frac", float(aux["drop_frac"]))
                if "drop_vis" in aux:
                    LLOG.record("drop_vis", float(aux["drop_vis"]))
                if "chunk_active" in aux:
                    LLOG.record("chunk_active", float(aux["chunk_active"]))
                if "clamp_frac" in aux:
                    LLOG.record("clamp_frac", float(aux["clamp_frac"]))
                if "gs_sdf_overflow" in aux:
                    LLOG.record("gs_sdf_ovf", float(aux["gs_sdf_overflow"]))
                LLOG.record("gs_num", int(jnp.sum(self.gs_state.alive)))
                if _fires(i, b, log_every * 50):
                    for k, v in memory_stats().items():
                        LLOG.record(k, v)
                if log_path:
                    LLOG.flash(log_path, cols=gs_cols)
                    if _fires(i, b, 2000) and i > 0:
                        _plot_async(log_path)

            # resume snapshot LAST in the loop body: it must capture the
            # post-log sample_std so a resumed run replays the exact
            # trajectory of an uninterrupted one (tested bit-for-bit)
            if (cfg.resume_interval > 0 and i > start_iter
                    and _fires(i, b, cfg.resume_interval)):
                self.export_gs_resume(i + b)

            if log_now and self._poll_keys():
                break

        # keep the standalone SDF optimizer view in sync with the joint
        # phase's live moments (the shared-Adam analog of the reference's
        # single optimizer): without this, export_checkpoint would pair
        # final joint-phase sdf params with stale SDF-phase moments. Only
        # when the joint phase actually TRAINS the SDF — with the SDF side
        # detached its moments just decay to zero and would erase the real
        # SDF-phase state.
        if spec.gs_sdf_reg and not spec.detach_sdf_grad:
            from .optim import AdamState

            self.sdf_opt = AdamState(
                step=self.gs_state.opt.step,
                mu=self.gs_state.opt.mu["sdf"],
                nu=self.gs_state.opt.nu["sdf"],
            )

        # completion marker: --resume on a run whose TRAINING finished
        # (outage during exports/eval) must go straight to exports, not
        # re-train the tail from the last mid-phase snapshot
        if cfg.model_path and iters >= cfg.gs_iter_step:
            (Path(cfg.model_path) / "gs_done").touch()

    def _handle_key(self, cmd: str):
        """Dispatch one keyboard command at an iteration boundary
        (keyboard_loop cases, neural_mapping.cpp:1493-1556)."""
        tok = cmd.split()
        if not tok:
            return
        c = tok[0]
        try:
            if c == "q":
                print("keyboard: stopping training -> final exports")
                self._stop = True
            elif c == "m":
                res = (
                    float(tok[1]) if len(tok) > 1
                    else self.cfg.export_resolution
                )
                self.save_mesh(res)
            elif c == "o":
                self.export_checkpoint()
                print("checkpoint exported")
            elif c in ("i", "p"):
                idx = int(tok[1]) if len(tok) > 1 else self.cfg.test_idx
                p = self.export_test_image(idx)
                if p is not None:
                    print(f"test image PSNR: {p:.2f}")
            elif c == "r":
                for split in ("train", "eval"):
                    self.render_path(split)
            elif c == "e":
                # eval_mesh + eval_render (neural_mapping.cpp:1508-1511)
                self._keyboard_eval()
            elif c == "v":
                # render-speed test + timing dump (case 'v', :1571-1575)
                import time as _time

                t0 = _time.perf_counter()
                n = 0
                for k in range(min(8, self.loader.num_train)):
                    _, pose = self.loader.train_frame(k)
                    self.render_image(pose, scale=self._render_scale)
                    n += 1
                dt = (_time.perf_counter() - t0) / max(n, 1)
                print(f"render speed: {dt * 1e3:.1f} ms/frame "
                      f"({1.0 / max(dt, 1e-9):.1f} fps)")
                print(LLOG.timing_summary())
            elif c in ("d", "s"):
                # double / halve render resolution (cases 'd'/'s',
                # :1576-1607) — a scale factor on the eval camera here
                # (the train camera's static shapes must not change mid-jit)
                self._render_scale *= 2.0 if c == "d" else 0.5
                cam = self.loader.camera.scaled(self._render_scale)
                print(f"render resolution -> {cam.width}x{cam.height}")
            elif c in ("n", "b"):
                # near-plane nudge (cases 'n'/'b', :1632-1643)
                self.cfg.near *= 1.2 if c == "n" else 0.8
                print(f"near -> {self.cfg.near:.4f}")
            elif c == "g":
                # save inrange pointcloud (reference help text 'g')
                if self.cfg.output_path and self.pack_dev is not None:
                    xyz = np.asarray(
                        self.pack_dev["origin"]
                        + self.pack_dev["direction"] * self.pack_dev["depth"]
                    )
                    p = Path(self.cfg.output_path) / "inrange_points.ply"
                    write_ply_xyz(p, xyz)
                    print(f"saved {len(xyz)} points -> {p}")
            else:
                print(
                    "commands: m [res] mesh | e eval mesh+render | o ckpt |"
                    " i/p [idx] test image | r render paths | v speed test |"
                    " d/s double/halve render res | n/b near +/- | q stop"
                )
        except Exception as e:
            print(f"command {c!r} failed: {e}")

    def _keyboard_eval(self):
        """eval_mesh + eval_render on demand (keyboard 'e')."""
        cfg = self.cfg
        if cfg.sdf_weight > 0 and cfg.export_mesh:
            verts, faces, _ = self.save_mesh(cfg.export_resolution)
            gt = getattr(self.loader.parser, "gt_mesh_path", None)
            if gt is not None and Path(gt).exists() and len(faces):
                from ..eval.mesh_metrics import eval_mesh
                from ..utils.ply import read_ply_xyz

                m = eval_mesh(verts, faces, read_ply_xyz(gt))
                print("mesh eval:", {k: round(v, 3) for k, v in m.items()})
        base = self.render_path("train", scale=self._render_scale)
        if base is not None:
            from ..eval.image_metrics import evaluate_dirs

            print("render eval:", evaluate_dirs(base))

    def _poll_keys(self):
        cmd = self._keys.poll()
        if cmd is not None:
            self._handle_key(cmd)
        return self._stop

    def _train_mask(self):
        """Per-dataset image mask applied to the rgb/dssim losses
        (neural_mapping.cpp:231-240; parsed at colmap_parser.hpp:110-112).
        Device-cached; None when the dataset has no mask."""
        if getattr(self, "_mask_dev", "unset") == "unset":
            m = getattr(self.loader.parser, "mask", None)
            if m is not None:
                cam = self.loader.camera
                m = np.asarray(m, np.float32)
                if m.shape[:2] != (cam.height, cam.width):
                    import cv2

                    m = cv2.resize(
                        m[..., 0], (cam.width, cam.height),
                        interpolation=cv2.INTER_NEAREST,
                    )[..., None]
                self._mask_dev = jnp.asarray(m)
            else:
                self._mask_dev = None
        return self._mask_dev

    # -- rendering / export ------------------------------------------------

    def render_settings(self, scale: float = 1.0) -> RenderSettings:
        """EXACT-render settings for eval/export images: larger tile cap +
        full bbox windows (cfg.eval_tile_*). Train-time caps/windows are a
        static-shape adaptation whose truncation training absorbs; exported
        images must match the reference's unbounded lists
        (neural_gaussian.cpp:207-223). Chip-validated: 70 dB vs an
        unbounded render at the 270k-splat point (vs 29 dB with train
        settings)."""
        cam = self.loader.camera.scaled(scale) if self.loader else None
        cfg = self.cfg
        return RenderSettings(
            width=cam.width,
            height=cam.height,
            near=cfg.near,
            far=cfg.far,
            sh_degree=cfg.sh_degree,
            tile_size=cfg.tile_size,
            tile_cap=cfg.eval_tile_cap,
            tile_expand=cfg.eval_tile_expand,
            tile_expand_small=cfg.eval_tile_expand_small,
            bck_color=cfg.bck_color,
        )

    def render_image(self, pose_c2w, scale: float = 1.0) -> Dict[str, np.ndarray]:
        cam = self.loader.camera.scaled(scale)
        out = self._render_jit(
            splat_model(self.gs_state),
            jnp.asarray(pose_c2w),
            jnp.asarray(cam.K),
            self.render_settings(scale),
            training=False,
        )
        return {k: np.asarray(v) for k, v in out.items()
                if k in ("color", "depth", "normal", "alpha", "median")}

    def export_test_image(self, test_idx: int, prefix: str = ""):
        """Mid-training image dump + PSNR (export_test_image,
        neural_mapping.cpp:1202-1328)."""
        if self.loader.num_train == 0:
            return None
        k = min(test_idx, self.loader.num_train - 1)
        gt, pose = self.loader.train_frame(k)
        out = self.render_image(pose)
        p = float(psnr_fn(jnp.asarray(out["color"]), jnp.asarray(gt)))
        if self.cfg.output_path:
            import cv2

            from ..eval.tools import depth_colormap

            base = Path(self.cfg.output_path) / "gs_log" / "mid"
            for d in ("color", "gt", "depth", "normal"):
                (base / d).mkdir(parents=True, exist_ok=True)
            _save_image(base / "color" / f"{prefix}render.png", out["color"])
            _save_image(base / "gt" / f"{prefix}gt.png", gt)
            cv2.imwrite(
                str(base / "depth" / f"{prefix}depth.png"),
                cv2.cvtColor(
                    depth_colormap(out["depth"][..., 0]), cv2.COLOR_RGB2BGR
                ),
            )
            _save_image(
                base / "normal" / f"{prefix}normal.png",
                out["normal"] * 0.5 + 0.5,
            )
            # metrics_single.py analog (neural_mapping.cpp:1313-1321):
            # PSNR+SSIM per exported image, appended to one json
            from ..ops.ssim import ssim as ssim_fn

            s = float(
                ssim_fn(jnp.asarray(out["color"]), jnp.asarray(gt))
            )
            mpath = base / "metrics.json"
            hist = (
                json.loads(mpath.read_text()) if mpath.exists() else {}
            )
            hist[f"{prefix}render.png"] = {
                "PSNR": round(p, 3), "SSIM": round(s, 4)
            }
            mpath.write_text(json.dumps(hist, indent=True))
        return p

    def save_mesh(self, resolution: Optional[float] = None, save: bool = True):
        """Mesh export (save_mesh, neural_mapping.cpp:1380-1402)."""
        cfg = self.cfg
        res = resolution or cfg.export_resolution
        # k_vis_attribute: 0 = gray (storage-lean), 1 = normal colors
        # (local_map.cpp:292-310)
        verts, faces, colors = extract_mesh(
            self.sdf_params, self.geom, self.field_spec, self.grid, res,
            with_colors=cfg.vis_attribute == 1,
        )
        if cfg.cull_mesh and self.loader is not None and len(verts):
            parser = self.loader.parser
            depths = []
            poses = []
            for i in parser.train_ids:
                poses.append(parser.depth_poses[i])
                try:
                    depths.append(
                        parser.get_depth_image(i)
                        if parser.depth_type == 0
                        else None
                    )
                except Exception:
                    depths.append(None)
            keep = cull_mesh_by_depth(
                verts, faces, self.loader.camera.K, np.asarray(poses),
                depths, self.loader.camera.width, self.loader.camera.height,
            )
            verts, faces, colors = apply_vertex_mask(verts, faces, colors, keep)
        if save and cfg.output_path:
            out = Path(cfg.output_path) / "mesh"
            out.mkdir(parents=True, exist_ok=True)
            path = out / f"mesh_{res}.ply"
            c8 = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            write_ply(
                path,
                {
                    "x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2],
                    "red": c8[:, 0], "green": c8[:, 1], "blue": c8[:, 2],
                },
                faces=faces,
            )
            print(f"mesh: {len(verts)} verts / {len(faces)} faces -> {path}")
        return verts, faces, colors

    def render_path(self, split: str = "train", scale: float = 1.0):
        """Offline render of the train/eval trajectory (render_path,
        neural_mapping.cpp:1108-1200): writes renders/ + gt/ for the image
        eval plus depth/ (TURBO) + normal/ dirs and
        render_color.mp4 / render_depth.mp4 (the reference's output tree,
        neural_mapping.cpp:910-930,1115-1199)."""
        import cv2

        from ..eval.tools import depth_colormap, write_video

        cfg = self.cfg
        base = Path(cfg.output_path) / "gs_log" / split
        for d in ("renders", "gt", "depth", "normal"):
            (base / d).mkdir(parents=True, exist_ok=True)
        if split == "train":
            it = (
                self.loader.train_frame(k)
                for k in range(self.loader.num_train)
            )
        else:
            it = self.loader.eval_frames()
        n = 0
        for k, (gt, pose) in enumerate(it):
            out = self.render_image(pose, scale)
            _save_image(base / "renders" / f"{k:05d}.png", out["color"])
            _save_image(base / "gt" / f"{k:05d}.png", gt)
            cv2.imwrite(
                str(base / "depth" / f"{k:05d}.png"),
                cv2.cvtColor(
                    depth_colormap(out["depth"][..., 0]), cv2.COLOR_RGB2BGR
                ),
            )
            _save_image(base / "normal" / f"{k:05d}.png",
                        out["normal"] * 0.5 + 0.5)
            n += 1
        if n:
            for src, name in (("renders", "render_color.mp4"),
                              ("depth", "render_depth.mp4")):
                try:
                    write_video(base / src, base / name, fps=cfg.fps)
                except Exception as e:  # pragma: no cover — codec-dependent
                    print(f"video {name} failed: {e}")
        return base if n else None

    # -- checkpoint --------------------------------------------------------

    def export_checkpoint(self):
        """model/sdf_checkpoint.npz + model/gs.ply + pt.yaml
        (export_checkpoint, neural_mapping.cpp:1331-1342)."""
        cfg = self.cfg
        if not cfg.model_path:
            return
        model_dir = Path(cfg.model_path)
        model_dir.mkdir(parents=True, exist_ok=True)
        flat = {}

        def flatten(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    flatten(f"{prefix}.{k}" if prefix else k, v)
            elif isinstance(tree, (list, tuple)):
                for j, v in enumerate(tree):
                    flatten(f"{prefix}.{j}", v)
            else:
                flat[prefix] = np.asarray(tree)

        flatten("", self.sdf_params)
        # full optimizer-state round-trip (beyond-reference: the reference
        # drops Adam moments, neural_mapping.cpp:1331-1342, so its resumes
        # restart the moment estimates)
        if self.sdf_opt is not None:
            flatten("__opt__.step", self.sdf_opt.step)
            flatten("__opt__.mu", self.sdf_opt.mu)
            flatten("__opt__.nu", self.sdf_opt.nu)
        # SDF-phase host state (beyond reference): a resume that lands
        # BEFORE the first mid-GS snapshot must not silently train on the
        # un-outlier-filtered ray pack / default sample_std
        if getattr(self, "pack_idx", None) is not None:
            flat["__resume__.pack_idx"] = np.asarray(self.pack_idx)
            flat["__resume__.sample_std"] = np.float64(self.sample_std)
            flat["__resume__.key"] = np.asarray(self.key)
        np.savez(model_dir / "sdf_checkpoint.npz", **flat)
        if self.gs_state is not None:
            n = export_gs_ply(model_dir / "gs.ply", splat_model(self.gs_state))
            print(f"exported {n} splats -> gs.ply")
        save_pt_params(cfg, model_dir / "pt.yaml")

    def export_gs_resume(self, next_iter: int):
        """Mid-GS-phase resume snapshot: the FULL GSState pytree (params,
        Adam moments, densify stats, anchors, alive) + iteration counter +
        sample_std + RNG key + surviving-ray indices. No reference analog —
        outage-proofing: the reference restarts the phase on a crash; over
        a fragile device tunnel that costs hours. Atomic (tmp + rename)."""
        cfg = self.cfg
        if not cfg.model_path or self.gs_state is None:
            return
        leaves = jax.tree_util.tree_leaves(self.gs_state)
        path = Path(cfg.model_path) / "gs_resume.npz"
        # np.savez appends ".npz" to names without it — keep the suffix
        tmp = path.with_name("gs_resume.tmp.npz")
        np.savez(
            tmp,
            gs_iter=np.int64(next_iter),
            sample_std=np.float64(self.sample_std),
            key=np.asarray(self.key),
            pack_idx=self.pack_idx,
            **{f"leaf{j}": np.asarray(x) for j, x in enumerate(leaves)},
        )
        tmp.replace(path)

    def load_gs_resume(self) -> Optional[int]:
        """Restore a gs_resume snapshot; returns the iteration to continue
        from, or None when no snapshot exists. Must run after
        build_occ_map + load_checkpoint (needs sdf_params + pack_dev)."""
        cfg = self.cfg
        path = Path(cfg.model_path) / "gs_resume.npz"
        if not path.exists():
            return None
        data = np.load(path)
        # a minimal same-STRUCTURE state provides the treedef (capacity
        # differs; tree structure does not)
        template = gs_state_init(
            self.sdf_params,
            build_splat_model(
                jax.random.PRNGKey(0), jnp.zeros((1, 3)),
                jnp.zeros((1, 3)),
                jnp.array([[1.0, 0.0, 0.0, 0.0]]), jnp.zeros((1,)),
                self.cfg.sh_degree, 8,
            ),
        )
        treedef = jax.tree_util.tree_structure(template)
        leaves = [
            jnp.asarray(data[f"leaf{j}"]) for j in range(treedef.num_leaves)
        ]
        self.gs_state = jax.tree_util.tree_unflatten(treedef, leaves)
        self.sdf_params = self.gs_state.params["sdf"]
        self.sample_std = float(data["sample_std"])
        self.key = jnp.asarray(data["key"])
        self._apply_pack_idx(np.asarray(data["pack_idx"]))
        return int(data["gs_iter"])

    def load_checkpoint(self, model_dir):
        """Rebuild fields from a run dir (load_checkpoint,
        neural_mapping.cpp:1344-1378)."""
        from ..config import load_pt_params
        from ..utils.ply import read_ply_xyz

        model_dir = Path(model_dir)
        load_pt_params(self.cfg, model_dir / "pt.yaml")
        cfg = self.cfg
        self.geom = MapGeometry(
            origin=tuple(cfg.map_origin), map_size=cfg.full_map_size
        )
        data = np.load(model_dir / "sdf_checkpoint.npz")

        def unflatten(keys):
            tree: Dict = {}
            for k in keys:
                parts = k.split(".")
                node = tree
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = jnp.asarray(data[k])
            return tree

        tree = unflatten(
            [k for k in data.keys()
             if not k.startswith(("__opt__.", "__resume__."))]
        )

        def fix_decoder(t):
            # lists were flattened with int keys; restore decoder lists
            dec = t["decoder"]
            t["decoder"] = {
                k: [v[str(i)] for i in range(len(v))] for k, v in dec.items()
            } if all(isinstance(v, dict) for v in dec.values()) else dec
            return t

        self.sdf_params = fix_decoder(tree)
        opt_keys = [k for k in data.keys() if k.startswith("__opt__.")]
        if opt_keys:
            from .optim import AdamState

            ot = unflatten(opt_keys)["__opt__"]
            self.sdf_opt = AdamState(
                step=jnp.asarray(ot["step"]),
                mu=fix_decoder(ot["mu"]),
                nu=fix_decoder(ot["nu"]),
            )
        else:
            self.sdf_opt = adam_init(self.sdf_params)

        # replay the SDF-phase host state (outlier-filtered pack, adapted
        # sample_std, RNG position) when the checkpoint carries it and the
        # data-side pack exists
        if "__resume__.pack_idx" in data and self.pack_dev is not None:
            self._apply_pack_idx(np.asarray(data["__resume__.pack_idx"]))
            self.sample_std = float(data["__resume__.sample_std"])
            self.key = jnp.asarray(data["__resume__.key"])

        prior = model_dir / "as_occ_prior.ply"
        if prior.exists():
            pts = read_ply_xyz(prior)
            self.grid = build_occupancy_grid(
                pts, self.geom, cfg.map_resolution, dilate=False
            )
        gs_ply = model_dir / "gs.ply"
        if gs_ply.exists():
            model = import_gs_ply(gs_ply)
            self.gs_state = gs_state_init(self.sdf_params, model)

    def _apply_pack_idx(self, idx: np.ndarray):
        """Subset the device ray pack to the given ORIGINAL-pack indices,
        composing safely over any subsetting already applied (pack_idx is
        strictly increasing, so positions resolve by binary search)."""
        if np.array_equal(idx, self.pack_idx):
            return
        pos = np.searchsorted(self.pack_idx, idx)
        if pos.size and (pos.max() >= len(self.pack_idx)
                         or not np.array_equal(self.pack_idx[pos], idx)):
            raise ValueError(
                "resume pack indices are not a subset of the current ray "
                "pack — dataset or preprocessing changed since the run"
            )
        self.pack_dev = {
            k: v[jnp.asarray(pos)] for k, v in self.pack_dev.items()
        }
        self.pack_idx = idx

    # -- full run ----------------------------------------------------------

    def batch_train(self):
        """The end-to-end train flow (batch_train,
        neural_mapping.cpp:814-875)."""
        cfg = self.cfg
        t0 = time.time()
        if cfg.prefilter > 0:
            self.prefilter_data()
        self.build_occ_map()
        if cfg.sdf_weight > 0:
            self.nsdf_train()
            self.export_checkpoint()
        if cfg.rgb_weight > 0 and not self._stop:
            self.init_gs()
            self.gs_train()
        print(f"train took {time.time() - t0:.0f}s")
        self.end()

    def resume_train(self):
        """Continue an interrupted run from its run dir: rebuild the
        deterministic data-side state (prefilter, occupancy, ray pack),
        restore the SDF checkpoint, then either resume the joint GS phase
        mid-flight (gs_resume.npz) or rerun it from its start if only the
        SDF-phase checkpoint landed."""
        cfg = self.cfg
        t0 = time.time()
        if cfg.prefilter > 0:
            self.prefilter_data()
        self.build_occ_map()
        self.load_checkpoint(Path(cfg.model_path))
        start = self.load_gs_resume()
        done = (Path(cfg.model_path) / "gs_done").exists()
        if done:
            print("GS phase already complete; running final exports")
        elif start is not None and start < cfg.gs_iter_step:
            print(f"resuming joint GS phase at iteration {start}")
            self.gs_train(start_iter=start)
        elif start is None:
            if self.gs_state is None:
                self.init_gs()
            self.gs_train()
        else:
            print("GS phase already complete; running final exports")
        print(f"train took {time.time() - t0:.0f}s (resumed)")
        self.end()

    def end(self):
        """Final exports + eval (end, neural_mapping.cpp:1686-1758)."""
        cfg = self.cfg
        self.export_checkpoint()
        if cfg.output_path:
            LLOG.save_timing(Path(cfg.output_path) / "timing.txt")
        # k_export_mesh gate (end, neural_mapping.cpp:1689-1694)
        if cfg.sdf_weight > 0 and cfg.export_mesh:
            verts, faces, _ = self.save_mesh(cfg.export_resolution)
            # mesh eval vs GT (eval_mesh, neural_mapping.cpp:1404-1433)
            gt = getattr(self.loader.parser, "gt_mesh_path", None) \
                if self.loader else None
            if gt is not None and Path(gt).exists() and len(faces):
                try:
                    from ..eval.mesh_metrics import eval_mesh
                    from ..utils.ply import read_ply_xyz

                    metrics = eval_mesh(verts, faces, read_ply_xyz(gt))
                    out = Path(cfg.output_path) / "structure_eval.json"
                    with open(out, "w") as f:
                        json.dump(metrics, f, indent=True)
                    print("mesh eval:", {k: round(v, 3)
                                          for k, v in metrics.items()})
                except Exception as e:  # pragma: no cover
                    print(f"mesh eval failed: {e}")
        if self.gs_state is not None and cfg.output_path:
            for split in ("train", "eval"):
                base = self.render_path(split)
                if base is not None:
                    from ..eval.image_metrics import evaluate_dirs
                    from ..eval.tools import create_comparison_video

                    try:
                        summary = evaluate_dirs(base)
                        print(split, summary)
                    except Exception as e:  # pragma: no cover
                        print(f"eval {split} failed: {e}")
                    try:
                        create_comparison_video(
                            base / "gt", base / "renders",
                            base / "comparison.mp4", fps=cfg.fps,
                        )
                    except Exception as e:  # pragma: no cover
                        print(f"comparison video {split} failed: {e}")
        # loss-curve plots (draw_loss.py analog, misc_loop)
        if cfg.output_path:
            from ..eval.tools import plot_log

            for name in ("nsdf_log.txt", "gs_log.txt"):
                lp = Path(cfg.output_path) / name
                if lp.exists():
                    try:
                        plot_log(lp)
                    except Exception as e:  # pragma: no cover
                        print(f"plot {name} failed: {e}")


def _fires(i: int, stride: int, every: int) -> bool:
    """Schedule trigger for loops advancing ``stride`` iterations per step:
    true iff [i - stride, i] crossed a multiple of ``every`` (equals
    ``i % every == 0`` at stride 1)."""
    return every > 0 and (i // every) != ((i - stride) // every)


def _frame_order(seed: int, n_train: int, iters: int, batch: int):
    """Random-permutation frame schedule covering ``iters`` images, padded
    up to a whole number of ``batch``-sized steps (the reference reshuffles
    every epoch, gs_train_batch_iter, neural_mapping.cpp:205-208)."""
    total = -(-max(iters, 1) // batch) * batch
    order = []
    i = 0
    while len(order) < total:
        order.extend(
            np.random.RandomState(seed + i).permutation(n_train).tolist()
        )
        i += n_train
    return order[:total]


class _KeyWatcher:
    """Train-time stdin commands (keyboard_loop, neural_mapping.cpp:
    1482-1684). Active only on an interactive TTY, so headless/CI runs are
    untouched. Commands queue here and execute at iteration boundaries ON
    the train thread (the reference runs them concurrently behind
    render_mutex_; boundary execution gives the same UX without device
    contention)."""

    def __init__(self):
        import queue
        import threading

        self.q: "queue.Queue[str]" = queue.Queue()
        try:
            self.active = sys.stdin is not None and sys.stdin.isatty()
        except Exception:
            self.active = False
        if self.active:
            threading.Thread(target=self._read, daemon=True).start()

    def _read(self):
        try:
            for line in sys.stdin:
                self.q.put(line.strip())
        except Exception:
            pass

    def poll(self):
        import queue

        if not self.active:
            return None
        try:
            return self.q.get_nowait()
        except queue.Empty:
            return None


def _plot_async(log_path):
    """Regenerate the loss-curve plot off the train thread (the reference's
    misc_loop shells to draw_loss.py asynchronously,
    neural_mapping.cpp:1760-1770). Never raises; skips if one is running."""
    import threading

    if getattr(_plot_async, "_busy", False):
        return

    def run():
        try:
            from ..eval.tools import plot_log

            plot_log(log_path)
        except Exception:
            pass
        finally:
            _plot_async._busy = False

    _plot_async._busy = True
    threading.Thread(target=run, daemon=True).start()


def _quant_u8(g) -> np.ndarray:
    """float 0..1 -> uint8 with ROUNDING (floor would both bias the GT dark
    by ~0.5/255 and mis-quantize exact k/255 values whose f32 product is
    k - eps)."""
    return np.clip(np.rint(np.asarray(g) * 255.0), 0, 255).astype(np.uint8)


class _FrameFetcher:
    """Decoded-frame supply for the GS loop.

    ``preload=True`` decodes the full color stack once (uint8 — the
    reference's load_colors, base_parser.cpp:843-857); otherwise frames
    decode on demand. Either way a background thread keeps the next
    batches assembled while the device step runs, so host decode and H2D
    staging overlap compute (double-buffered via a bounded queue).
    """

    @staticmethod
    def preload_stack(loader):
        """Decode the full train color stack once (uint8) — share the
        result between fetchers (color-init + main loop) to avoid a
        second full-decode pass."""
        from concurrent.futures import ThreadPoolExecutor

        n = loader.num_train
        g0, _ = loader.train_frame(0)
        gts = np.empty((n,) + g0.shape, np.uint8)
        poses = np.empty((n, 4, 4), np.float32)

        def decode(k):
            g, p = loader.train_frame(k)
            gts[k] = _quant_u8(g)
            poses[k] = np.asarray(p, np.float32)

        # cv2 decode releases the GIL — threads parallelize the stack
        # build (the reference preloads with OpenMP, base_parser.cpp:845)
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(decode, range(n)))
        print(f"preloaded {n} frames ({gts.nbytes / 1e9:.2f} GB)")
        return gts, poses

    def __init__(self, loader, order, batch: int, preload: bool = False,
                 depth: int = 2, to_device: bool = False, pre=None):
        import queue
        import threading

        self.loader = loader
        self.order = order
        self.batch = batch
        # single-device mode: stage the H2D copy from the prefetch thread
        # so the transfer overlaps the device step (double-buffered).
        # Sharded runs keep host arrays (placement is the step's job).
        self._to_device = to_device
        self._pre = pre
        if preload and pre is None:
            self._pre = self.preload_stack(loader)
        # Device-RESIDENT stack: per-iter jax.device_put of a fresh frame
        # leaks host RSS at exactly frame-size/iter through the axon
        # client (~2.4 MB/iter at 1200x680 — the r03b/r04 linear RSS
        # creep; the r03 recompile diagnosis was wrong). When the whole
        # preloaded stack fits a budget, ship it to the device ONCE and
        # index it there — per-iter H2D drops to the 64 B pose.
        self._dev_stack = None
        if self._to_device and self._pre is not None:
            import os

            budget = float(os.environ.get("GSSDF_DEV_STACK_MB", "512"))
            if self._pre[0].nbytes <= budget * 1e6:
                import jax

                self._dev_stack = jax.device_put(self._pre[0])
        self._q = queue.Queue(maxsize=depth)
        self._t = threading.Thread(target=self._produce, daemon=True)
        self._t.start()

    def _get(self, k: int):
        """Frames stay uint8 on the host; the jitted step normalizes
        on-device (4x less H2D than f32 — significant through the axon
        tunnel at 1200x680)."""
        if self._pre is not None:
            return self._pre[0][k], self._pre[1][k]
        g, p = self.loader.train_frame(k)
        return _quant_u8(g), np.asarray(p, np.float32)

    def _produce(self):
        try:
            for s in range(0, len(self.order), self.batch):
                ks = self.order[s:s + self.batch]
                if self._dev_stack is not None:
                    import jax
                    import jax.numpy as jnp

                    g = jnp.take(
                        self._dev_stack,
                        jnp.asarray(np.asarray(ks, np.int32)),
                        axis=0,
                    )
                    p = jax.device_put(
                        np.stack([self._pre[1][k] for k in ks])
                    )
                    self._q.put((g, p))
                    continue
                gs, ps = zip(*(self._get(k) for k in ks))
                g, p = np.stack(gs), np.stack(ps)
                if self._to_device:
                    import jax

                    g, p = jax.device_put(g), jax.device_put(p)
                self._q.put((g, p))
        except Exception as e:  # pragma: no cover — surfaced on next get
            self._q.put(e)
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item


def _save_image(path, img: np.ndarray):
    import cv2

    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    cv2.imwrite(str(path), arr)
