"""Sharded training steps: rays and cameras data-parallel over the mesh.

Reference analog: none — the reference is single-GPU (SURVEY.md §2.3). This
is the TPU-native scaling layer: per BASELINE.md's north star, ray batches
(SDF phase) and camera batches (GS phase) shard over a 1-D ``data`` mesh;
hash-grid + splat parameters are replicated and the XLA SPMD partitioner
inserts the gradient all-reduce (psum) over ICI.

Implementation style: plain ``jax.jit`` with ``in_shardings`` — shardings
constrain the inputs, autodiff produces the replicated-grad sum, and XLA
lays out the collectives. No hand-written communication.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.occupancy import OccupancyGrid, valid_mask
from ..fields.sampling import RayBatch, compact_samples, sample_points
from ..fields.sdf_field import MapGeometry, sdf_apply, sdf_apply_with_grad
from ..gs.model import SplatModel
from ..ops.pallas.segsum import segment_sum, table_gather
from ..gs.render import render_splats
from ..sensors.cameras import Camera
from .. import losses
from ..train.gs import GSState, GSTrainSpec, gs_image_losses, gs_lr_tree
from ..train.optim import adam_update
from ..train.sdf import (
    SDFTrainSpec,
    align_regularization,
    sdf_losses,
    sdf_regularization,
)
from ..gs.model import update_densify_state


def make_sharded_sdf_train_step(
    spec: SDFTrainSpec, geom: MapGeometry, grid: OccupancyGrid, mesh: Mesh
):
    """SDF step with the ray batch sharded over the ``data`` axis
    (params/opt replicated; grad psum inserted by SPMD)."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def step_impl(params, opt_state, ray_origin, ray_dir, ray_depth, key,
                  sample_std, lr):
        kreg, ksamp = jax.random.split(key)
        rays = RayBatch(
            origin=ray_origin,
            direction=ray_dir,
            depth=ray_depth,
            xyz=ray_origin + ray_dir * ray_depth,
        )
        samples = sample_points(
            rays, grid, geom, ksamp,
            surface_sample_num=spec.surface_sample_num,
            free_sample_num=spec.free_sample_num,
            max_hits=spec.max_hits,
            max_steps=spec.max_steps,
            sample_std=sample_std,
            truncated_dis=spec.truncated_dis,
            inner_half_extent=spec.inner_half_extent,
        )
        if spec.point_budget > 0:
            # compaction sorts globally; pin the result back to the data
            # axis so the (dominant) hash-grid encode stays sharded
            samples = compact_samples(samples, spec.point_budget)
            samples = jax.lax.with_sharding_constraint(
                samples, NamedSharding(mesh, P("data"))
            )

        def loss_fn(p):
            return sdf_losses(p, samples, geom, spec, sample_std, kreg)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params2, opt2 = adam_update(grads, opt_state, params, lr)
        aux["loss"] = loss
        return params2, opt2, aux

    return jax.jit(
        step_impl,
        in_shardings=(rep, rep, shard, shard, shard, rep, rep, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_multicam_gs_train_step(
    spec: GSTrainSpec,
    geom: MapGeometry,
    grid: OccupancyGrid,
    cam: Camera,
    mesh: Optional[Mesh] = None,
):
    """Joint GS step over a batch of B cameras; B shards over the mesh.

    The reference renders one image per iteration (gs_train_batch_iter);
    rendering one image **per chip** per step is the TPU-native equivalent —
    same math per camera, psum'd gradients, B× throughput.
    """
    K = jnp.asarray(cam.K, jnp.float32)

    def step_impl(
        state: GSState,
        gt_images,     # [B, H, W, 3]
        poses,         # [B, 4, 4]
        ray_origin, ray_dir, ray_depth,
        key, sample_std, sdf_lr, xyz_lr,
        sh_active: int, opt_struct: bool,
        color_only: bool = False,
        mask=None,     # [H, W, 1] dataset image mask (replicated) or None
    ):
        if gt_images.dtype == jnp.uint8:
            gt_images = gt_images.astype(jnp.float32) * (1.0 / 255.0)
        b = gt_images.shape[0]
        # key derivation mirrors the single-device step (train/gs.py) so a
        # B=1 multicam step is BIT-IDENTICAL to the single step — the
        # multicam-vs-single parity test relies on this
        (krender, ksamp, kreg, kreg_gs, kreg_num,
         kreg_sel) = jax.random.split(key, 6)
        cam_keys = (
            krender[None] if b == 1 else jax.random.split(krender, b)
        )
        sel_keys = (
            kreg_sel[None] if b == 1 else jax.random.split(kreg_sel, b)
        )
        rsettings = spec.render._replace(sh_degree=sh_active)

        joint_sdf = spec.gs_sdf_reg and not spec.detach_sdf_grad
        if joint_sdf:
            rays = RayBatch(
                origin=ray_origin, direction=ray_dir, depth=ray_depth,
                xyz=ray_origin + ray_dir * ray_depth,
            )
            samples = sample_points(
                rays, grid, geom, ksamp,
                surface_sample_num=spec.sdf.surface_sample_num,
                free_sample_num=spec.sdf.free_sample_num,
                max_hits=spec.sdf.max_hits,
                max_steps=spec.sdf.max_steps,
                sample_std=sample_std,
                truncated_dis=spec.sdf.truncated_dis,
                inner_half_extent=spec.sdf.inner_half_extent,
            )
            if spec.sdf.point_budget > 0:
                samples = compact_samples(samples, spec.sdf.point_budget)
                if mesh is not None:
                    samples = jax.lax.with_sharding_constraint(
                        samples, NamedSharding(mesh, P("data"))
                    )

        c = state.alive.shape[0]

        def loss_fn(params, pix_delta_b, entry_pd_b=None):
            aux: Dict[str, jnp.ndarray] = {}
            sdf_p = params["sdf"]
            model = SplatModel(
                params=params["gs"], anchors=state.anchors, alive=state.alive
            )

            sdf_nn_loss = 0.0
            if joint_sdf:
                sdf_nn_loss, sdf_aux = sdf_losses(
                    sdf_p, samples, geom, spec.sdf, sample_std, kreg
                )
                aux["sdf_nn"] = sdf_nn_loss
                aux["isigma_mean"] = sdf_aux["isigma_mean"]

            # fused analytic path available: gs_sdf value AND eikonal grad
            # from ONE hash gather per camera (same semantics as the
            # single-device step, train/gs.py — a --mesh N run must train
            # the same math; reference: neural_mapping.cpp:449-452)
            gs_eik = (
                spec.gs_sdf_reg
                and joint_sdf
                and spec.sdf.eikonal_weight > 0
                and not spec.sdf.numerical_grad
            )

            def per_cam(gt, pose, pdel, epd, ck, creg, csel):
                render = render_splats(
                    model, pose, K, rsettings, training=True, key=ck,
                    pix_delta=pdel, entry_pix_delta=epd,
                    center_reg=spec.center_reg,
                )
                gs_loss, img_aux = gs_image_losses(
                    render, gt, params["gs"].scaling, render["visible"],
                    cam, pose, spec, opt_struct, mask=mask,
                )
                img_aux["drop_frac"] = jax.lax.stop_gradient(
                    render["drop_frac"]
                )
                img_aux["drop_vis"] = jax.lax.stop_gradient(
                    render["drop_vis"]
                )
                img_aux["chunk_active"] = jax.lax.stop_gradient(
                    render["chunk_active"]
                )
                gs_sdf_terms = {}
                sdf_cam = 0.0
                if spec.gs_sdf_reg:
                    vis = jax.lax.stop_gradient(render["visibilities"])
                    w = jax.lax.stop_gradient(render["samples_w"][:, 0]) * vis
                    x_gs = render["samples"]
                    m = (
                        (vis > spec.visible_thr)
                        & valid_mask(grid, x_gs)
                        & state.alive
                    )
                    if 0 < spec.gs_sdf_budget < x_gs.shape[0]:
                        # visible-first static compaction with random
                        # tiebreak within the visible set, same as the
                        # single-device step (train/gs.py)
                        n_vis = jnp.sum(m)
                        u = jax.random.uniform(csel, (x_gs.shape[0],))
                        order = jnp.argsort(jnp.where(m, u, 1.0 + u))
                        ids = jax.lax.stop_gradient(
                            order[: spec.gs_sdf_budget]
                        )
                        x_gs = table_gather(x_gs, ids)
                        w = w[ids]
                        m = m[ids]
                        gs_sdf_terms["gs_sdf_overflow"] = (
                            jnp.maximum(n_vis - spec.gs_sdf_budget, 0)
                            / jnp.maximum(n_vis, 1)
                        ).astype(jnp.float32)
                    if gs_eik:
                        # fused shared-gather eval: value (grad -> splats)
                        # + eikonal gradient (positions detached, the
                        # reference's xyz.detach(), neural_mapping.cpp:
                        # 450-452) + 2-probe align prior — identical math
                        # to the single-device step
                        gs_sdf, _, gs_grad, _ = sdf_apply_with_grad(
                            sdf_p, x_gs, geom, spec.sdf.field,
                            detach_grad_positions=True,
                        )
                        l_eik = losses.eikonal_loss(gs_grad, m)
                        al_aux: Dict[str, jnp.ndarray] = {}
                        sdf_cam = (
                            spec.sdf.eikonal_weight * l_eik
                            + align_regularization(
                                sdf_p, jax.lax.stop_gradient(x_gs), m,
                                gs_grad, geom, spec.sdf, sample_std, creg,
                                al_aux, name="gs_align",
                            )
                        )
                        gs_sdf_terms["gs_eik"] = l_eik
                        if "gs_align" in al_aux:
                            gs_sdf_terms["gs_align"] = al_aux["gs_align"]
                    else:
                        gs_sdf, _ = sdf_apply(
                            sdf_p, x_gs, geom, spec.sdf.field
                        )
                    w = jnp.where(m, w, 0.0)
                    if spec.gs_sdf_weight > 0:
                        l = losses.gs_sdf_loss(gs_sdf[:, 0], w)
                        gs_loss = gs_loss + spec.gs_sdf_weight * l
                        gs_sdf_terms["gs_sdf"] = l
                    if not gs_eik:
                        gs_sdf_terms["gs_samples"] = jax.lax.stop_gradient(
                            x_gs
                        )
                        gs_sdf_terms["gs_mask"] = m
                meta = (render["radii"], render["visibilities"],
                        render["visible"] & render["binned"],
                        render.get("tile_lists"))
                return gs_loss, img_aux, gs_sdf_terms, sdf_cam, meta

            reg_keys = (
                kreg_gs[None] if b == 1 else jax.random.split(kreg_gs, b)
            )
            epd_b = (
                entry_pd_b if entry_pd_b is not None
                else jnp.zeros((b, 0, 0, 2), jnp.float32)
            )
            gs_losses_b, img_aux_b, gs_sdf_b, sdf_cam_b, meta_b = jax.vmap(
                lambda gt, pose, pdel, epd, ck, creg, csel: per_cam(
                    gt, pose, pdel,
                    epd if entry_pd_b is not None else None,
                    ck, creg, csel,
                )
            )(gt_images, poses, pix_delta_b, epd_b, cam_keys, reg_keys,
              sel_keys)
            gs_loss = jnp.mean(gs_losses_b)
            aux.update({k: jnp.mean(v) for k, v in img_aux_b.items()})
            if spec.gs_sdf_reg and "gs_sdf" in gs_sdf_b:
                aux["gs_sdf"] = jnp.mean(gs_sdf_b["gs_sdf"])
            if spec.gs_sdf_reg and "gs_eik" in gs_sdf_b:
                aux["gs_eik"] = jnp.mean(gs_sdf_b["gs_eik"])
            if spec.gs_sdf_reg and "gs_align" in gs_sdf_b:
                aux["gs_align"] = jnp.mean(gs_sdf_b["gs_align"])
            if spec.gs_sdf_reg and "gs_sdf_overflow" in gs_sdf_b:
                # worst camera: a saturated budget must be visible in the
                # train log, not silent (same rule as tile_cap drop_frac)
                aux["gs_sdf_overflow"] = jnp.max(gs_sdf_b["gs_sdf_overflow"])
            if gs_eik:
                sdf_nn_loss = sdf_nn_loss + jnp.mean(sdf_cam_b)

            # numerical-grad fallback: FD regularizer on a subsample of
            # gs samples from all cameras (full capacity x FD offsets OOMs);
            # mirrors the single-device elif (train/gs.py)
            if (spec.gs_sdf_reg and joint_sdf
                    and spec.sdf.eikonal_weight > 0 and not gs_eik):
                xs = gs_sdf_b["gs_samples"].reshape(-1, 3)
                ms = gs_sdf_b["gs_mask"].reshape(-1)
                kk = spec.sdf.eikonal_sample_num
                if 0 < kk < xs.shape[0]:
                    sel = jax.random.randint(kreg_num, (kk,), 0, xs.shape[0])
                    xs, ms = xs[sel], ms[sel]
                sdf_nn_loss = sdf_nn_loss + sdf_regularization(
                    sdf_p, xs, ms, geom, spec.sdf, sample_std,
                    curvate=False, aux=aux,
                )

            total = gs_loss + sdf_nn_loss
            aux["gs_loss"] = gs_loss
            return total, (aux, meta_b)

        pix_delta0 = jnp.zeros((b, c, 2), jnp.float32)
        if spec.use_absgrad:
            ts = spec.render.tile_size
            ntl = (-(-spec.render.width // ts)) * (-(-spec.render.height // ts))
            epd0 = jnp.zeros((b, ntl, spec.render.tile_cap, 2), jnp.float32)
            (loss, (aux, meta_b)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True
            )(state.params, pix_delta0, epd0)
            g_params, g_pixdelta, g_epd_b = grads
            radii_b, vis_b, visible_b, tl_b = meta_b
            # per-cam per-entry |screen grad| summed per splat (sentinel
            # slot c dropped) — same semantics as the single-device step
            gabs_b = jax.vmap(
                lambda tl, ge: segment_sum(
                    tl.reshape(-1), jnp.abs(ge).reshape(-1, 2), c + 1
                )[:c]
            )(tl_b, g_epd_b)
        else:
            (loss, (aux, meta_b)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, pix_delta0)
            g_params, g_pixdelta = grads
            radii_b, vis_b, visible_b, _ = meta_b
            gabs_b = jnp.zeros((b, c, 2), jnp.float32)

        lr_tree = gs_lr_tree(
            spec, state.params["sdf"], sdf_lr, xyz_lr, color_only
        )
        params2, opt2 = adam_update(g_params, state.opt, state.params, lr_tree)

        # accumulate densify stats over all B cameras
        dstate = state.dstate
        def body(ds, xs):
            g, ga, r, v, vb = xs
            return update_densify_state(
                ds, g, r, v, vb, spec.render.width, spec.render.height,
                g_pixdelta_abs=ga if spec.use_absgrad else None,
            ), None
        dstate2, _ = jax.lax.scan(
            body, dstate, (g_pixdelta, gabs_b, radii_b, vis_b, visible_b)
        )

        aux["loss"] = loss
        return (
            GSState(params=params2, anchors=state.anchors, alive=state.alive,
                    opt=opt2, dstate=dstate2),
            aux,
        )

    if mesh is None:
        return jax.jit(
            step_impl,
            static_argnames=("sh_active", "opt_struct", "color_only"),
            donate_argnums=(0,),
        )
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_impl,
        static_argnames=("sh_active", "opt_struct", "color_only"),
        in_shardings=(rep, shard, shard, shard, shard, shard, rep, rep, rep,
                      rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
